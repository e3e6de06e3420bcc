"""Reader chain: lines+offsets, max_bytes, ndjson, multiline composition."""

from __future__ import annotations

import gzip
import json
import os

from beats_spark.sources import read_lines, read_ndjson, reader_chain


def _write(p, lines):
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_read_lines_offsets(spark, tmp_path):
    d = tmp_path / "logs"
    d.mkdir()
    _write(d / "a.log", ["l0", "l1", "l2"])
    _write(d / "b.log", ["m0", "m1"])
    out = read_lines(spark, str(d)).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(os.path.basename(r.source), []).append((r.offset, r.text))
    assert sorted(by_src["a.log"]) == [(0, "l0"), (1, "l1"), (2, "l2")]
    assert sorted(by_src["b.log"]) == [(0, "m0"), (1, "m1")]


def test_read_lines_max_bytes(spark, tmp_path):
    f = tmp_path / "x.log"
    _write(f, ["short", "y" * 100])
    out = sorted(read_lines(spark, str(f), max_bytes=10).collect())
    rows = {r.offset: r for r in out}
    assert rows[0].text == "short" and rows[0].flags == []
    assert rows[1].text == "y" * 10 and "truncated" in rows[1].flags


def test_read_ndjson(spark, tmp_path):
    f = tmp_path / "d.ndjson"
    _write(f, [json.dumps({"a": i, "b": f"v{i}"}) for i in range(3)])
    out = read_ndjson(spark, str(f), schema="a int, b string",
                      keys_under_root=True)
    rows = sorted((r.a, r.b) for r in out.collect())
    assert rows == [(0, "v0"), (1, "v1"), (2, "v2")]


def test_reader_chain_multiline_and_filters(spark, tmp_path):
    f = tmp_path / "trace.log"
    _write(f, [
        "ERROR boom",
        "  at a()",
        "  at b()",
        "INFO fine",
        "DEBUG noise",
    ])
    out = reader_chain(
        spark, str(f),
        multiline={"pattern": r"^\s+", "match": "after"},
        exclude_message=["DEBUG"],
    ).collect()
    msgs = sorted(r.text for r in out)
    assert msgs == ["ERROR boom\n  at a()\n  at b()", "INFO fine"]


def test_reader_chain_gzip_encoding(spark, tmp_path):
    # Spark's text source reads .gz transparently; charset decode applies
    f = tmp_path / "z.log.gz"
    with gzip.open(f, "wt", encoding="utf-8") as fh:
        fh.write("héllo wörld\nsecond\n")
    out = sorted(read_lines(spark, str(f)).collect())
    assert [r.text for r in out] == ["héllo wörld", "second"]


def test_read_lines_scalable_cursor(spark, tmp_path):
    # dense_offsets=False: shuffle-free cursor, strictly increasing per file
    d = tmp_path / "big"
    d.mkdir()
    _write(d / "a.log", [f"a{i}" for i in range(100)])
    _write(d / "b.log", [f"b{i}" for i in range(100)])
    out = read_lines(spark, str(d), dense_offsets=False).collect()
    per = {}
    for r in out:
        per.setdefault(os.path.basename(r.source), []).append((r.offset, r.text))
    for src, rows in per.items():
        rows.sort()
        texts = [t for _, t in rows]
        assert texts == sorted(texts, key=lambda s: int(s[1:]))  # file order
        offs = [o for o, _ in rows]
        assert offs == sorted(set(offs))  # strictly increasing, unique
