"""Local stand-in for the driver's correctness harness.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB over the
same sf dir, then compares row count, column-name set, and an
order-insensitive value hash (columns sorted by name, rows sorted).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> tuple[str, pd.DataFrame]:
    df = df[sorted(df.columns)].copy()

    def norm(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if pd.api.types.is_scalar(v) and pd.isna(v):
            return "NULL"
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, float):
            return repr(round(v, 6))
        return str(v)

    as_str = df.apply(lambda col: col.map(norm))
    rows = sorted(as_str.apply(lambda r: "\x1f".join(r), axis=1).tolist())
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16], as_str


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # Fail loudly on a bad invocation: a mistyped sf_dir (or a flag-style
    # arg landing in the positional slot) used to fall through to an empty
    # run that exited 0 — indistinguishable from a green sweep.
    if not os.path.isdir(sf_dir):
        print(f"ERROR: sf_dir {sf_dir!r} is not a directory "
              f"(usage: check_oracle.py [sf_dir] [query ...])")
        return 2

    import __spark_entry__ as entrymod
    from beats_spark.session import get_spark

    unknown = only - set(entrymod.queries())
    if unknown:
        print(f"ERROR: unknown query name(s): {sorted(unknown)}")
        return 2

    spark = get_spark(app_name="check-oracle")
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        except duckdb.IOException:
            pass

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"okay {name}: rows={len(sdf)} (no oracle, rows-only) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        else:
            hs, cs = canon(sdf)
            ho, co = canon(odf)
            if hs != ho:
                problems.append(f"hash {hs} vs {ho}")
                merged = cs.merge(co, how="outer", indicator=True)
                diff = merged[merged["_merge"] != "both"]
                print(diff.head(10).to_string())
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
            failures += 1
        else:
            print(f"PASS {name}: rows={len(sdf)} hash={hs} [{time.time()-t0:.1f}s]")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
