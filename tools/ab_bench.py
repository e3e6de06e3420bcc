"""Equal-hardware A/B of registry queries across two code revisions.

The round-2 verdict's open item: raw per-round bench deltas are confounded
by sandbox-VM drift, so any perf claim needs both code versions timed on
ONE machine, interleaved. This tool checks out each revision into a git
worktree under .ab/ and runs the SAME ordered query list in alternating
fresh-JVM subprocesses (A, B, A, B, ...), so slow-VM windows hit both sides
equally in expectation.

Usage:
    python tools/ab_bench.py --rev old=<sha> --rev new=WORKTREE \
        --queries q1,q2 [--iters 2] [--sf-dir /root/testdata/sf0.1]

`WORKTREE` means the current working tree (uncommitted code included).
Prints one JSON line: {query: {label: [sec, ...]}}.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, sys, time
path, sf_dir, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
sys.path.insert(0, path)
os.chdir(path)
from beats_spark.session import get_spark
from beats_spark import queries as Q
spark = get_spark()
# warm-up: JVM, parquet footers, Arrow init — outside every timing window
spark.read.parquet(f"{sf_dir}/events.parquet").count()
out = {}
for name in names:
    fn = Q.queries()[name]
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    out[name] = round(time.time() - t0, 3)
    spark.catalog.clearCache()
print("ABRESULT " + json.dumps(out))
"""


def run_side(path: str, sf_dir: str, names: list[str]) -> dict[str, float]:
    proc = subprocess.run(
        [sys.executable, "-c", _WORKER, path, sf_dir, ",".join(names)],
        capture_output=True, text=True, timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(
        f"worker failed for {path}: {proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )


def materialize(label: str, rev: str) -> str:
    if rev == "WORKTREE":
        return ROOT
    wt = os.path.join(ROOT, ".ab", label)
    if not os.path.isdir(wt):
        os.makedirs(os.path.dirname(wt), exist_ok=True)
        subprocess.run(["git", "worktree", "add", "--detach", wt, rev],
                       cwd=ROOT, check=True, capture_output=True)
    return wt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rev", action="append", required=True,
                    help="label=<sha|WORKTREE>")
    ap.add_argument("--queries", required=True)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    sides = []
    for spec in args.rev:
        label, rev = spec.split("=", 1)
        sides.append((label, materialize(label, rev)))
    names = args.queries.split(",")

    results: dict[str, dict[str, list[float]]] = {
        n: {label: [] for label, _ in sides} for n in names
    }
    for it in range(args.iters):
        for label, path in sides:
            timings = run_side(path, args.sf_dir, names)
            for n, sec in timings.items():
                results[n][label].append(sec)
            print(f"# iter {it} {label}: "
                  + " ".join(f"{n}={results[n][label][-1]}" for n in names),
                  file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
