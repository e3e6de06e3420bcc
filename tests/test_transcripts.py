"""Parity of the transcript derivation between Spark SQL and DuckDB.

This is the foundation of the whole correctness story: every pipeline oracle
starts from `oracle_cte()`, so the derivation itself must be byte-identical
across engines.
"""

from __future__ import annotations

import duckdb
import pytest

from beats_spark.data.transcripts import load_transcripts, oracle_cte

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def tdf(spark):
    return load_transcripts(spark, SF_SMOKE).cache()


def duck(sql: str, sf_dir: str = SF_SMOKE):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    return con.execute(sql).fetchall()


def test_schema(tdf):
    fields = [(f.name, f.dataType.simpleString()) for f in tdf.schema.fields]
    assert fields[:5] == [
        ("conv_id", "string"),
        ("turn_idx", "int"),
        ("role", "string"),
        ("text", "string"),
        ("tool", "string"),
    ]
    assert fields[5][0] == "ts" and fields[5][1] in ("timestamp", "timestamp_ntz")


def test_rowcount_matches_events(tdf, spark):
    n_events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
    assert tdf.count() == n_events


def test_turn_idx_dense_per_conv(tdf):
    from pyspark.sql import functions as F

    bad = (
        tdf.groupBy("conv_id")
        .agg(
            F.count("*").alias("n"),
            F.min("turn_idx").alias("lo"),
            F.max("turn_idx").alias("hi"),
            F.countDistinct("turn_idx").alias("d"),
        )
        .filter((F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1) | (F.col("d") != F.col("n")))
        .count()
    )
    assert bad == 0


def test_full_row_parity_with_duckdb(tdf):
    spark_rows = sorted(
        (r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts.isoformat())
        for r in tdf.collect()
    )
    duck_rows = sorted(
        (c, t, r, x, tool, ts.isoformat())
        for (c, t, r, x, tool, ts) in duck(
            oracle_cte() + " SELECT conv_id, turn_idx, role, text, tool, ts FROM transcripts"
        )
    )
    assert len(spark_rows) == len(duck_rows)
    for a, b in zip(spark_rows, duck_rows):
        assert a == b


def test_template_bank_coverage(tdf):
    from pyspark.sql import functions as F

    kinds = {
        "logfmt": tdf.filter(F.col("text").startswith("level=")).count(),
        "apache": tdf.filter(F.col("text").startswith("10.0.")).count(),
        "plain": tdf.filter(F.col("text").startswith("user ")).count(),
        "corrupt": tdf.filter(F.col("text").startswith("!!corrupt")).count(),
    }
    assert all(v > 0 for v in kinds.values()), kinds
    assert sum(kinds.values()) == tdf.count()
