"""End-to-end pipeline tests: routing correctness, per-sink aggregates,
fan-out write, enrich/filter operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beats_spark.data.transcripts import load_transcripts
from beats_spark.operators import enrich as E
from beats_spark.operators import filter as FL
from beats_spark.pipeline import (
    conv_rollups,
    full_pipeline,
    sink_aggregates,
)
from beats_spark.routing import fan_out

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def routed(spark):
    return full_pipeline(spark, SF_SMOKE).cache()


def test_every_row_routed(routed, spark):
    n = load_transcripts(spark, SF_SMOKE).count()
    assert routed.count() == n


def test_first_match_wins(routed):
    # corrupt rows must be in deadletter even if they also have role=tool
    corrupt = routed.filter(F.col("text").startswith("!!corrupt"))
    assert corrupt.filter(F.col("_sink") != "deadletter").count() == 0
    # tool-role non-corrupt rows all went to sink-tools (rule 2 beats rule 3/4)
    tools = routed.filter((F.col("role") == "tool") & ~F.col("text").startswith("!!corrupt"))
    assert tools.filter(F.col("_sink") != "sink-tools").count() == 0
    # no nulls
    assert routed.filter(F.col("_sink").isNull()).count() == 0


def test_error_routing(routed):
    errs = routed.filter(F.col("_sink") == "sink-errors")
    assert errs.count() > 0
    bad = errs.filter(
        ~(F.col("text").contains("level=ERROR") | F.col("text").contains('" 500 '))
    )
    assert bad.count() == 0


def test_enrich_lookup_values(routed):
    # every role mapped; unknown default never triggers on this domain
    assert routed.filter(F.col("role_group") == "unknown").count() == 0
    assert routed.filter(F.col("_id").isNull()).count() == 0
    assert routed.select("_id").distinct().count() == routed.count()
    # tool lookup left-join misses fall back to defaults
    missing = routed.filter((F.col("tool") == "none") | F.col("tool").isNull() | (F.col("tool") == ""))
    assert missing.filter(F.col("tool_kind") != "none").count() == 0


def test_sink_aggregates(routed):
    aggs = sink_aggregates(routed)
    total = aggs.agg(F.sum("turn_count")).first()[0]
    assert total == routed.count()
    by_sink = {r._sink: r for r in aggs.collect() if r.role == "tool"}
    assert "sink-tools" in by_sink


def test_conv_rollups(routed, spark):
    tdf = load_transcripts(spark, SF_SMOKE)
    roll = conv_rollups(tdf)
    assert roll.count() == tdf.select("conv_id").distinct().count()
    row = roll.first()
    assert row.n_turns > 0 and row.first_ts <= row.last_ts


def test_fan_out_single_pass(routed, tmp_path):
    base = str(tmp_path / "sinks")
    fan_out(routed.select("conv_id", "turn_idx", "role", "_sink"), base)
    spark = routed.sparkSession
    back = spark.read.parquet(base)
    assert back.count() == routed.count()
    # partition pruning works per sink directory
    dl = spark.read.parquet(base).filter(F.col("_sink") == "deadletter")
    assert dl.count() == routed.filter(F.col("_sink") == "deadletter").count()


def test_drop_and_include_fields(spark):
    df = spark.createDataFrame([(1, "a", "b", "c")], "id int, x string, y string, zz string")
    assert FL.drop_fields(df, ["x", "/z+/"]).columns == ["id", "y"]
    assert FL.include_fields(df, ["y"], mandatory=["id"]).columns == ["id", "y"]


def test_ratelimit(spark):
    import datetime

    rows = [
        ("k1", datetime.datetime(2024, 1, 1, 0, 0, i)) for i in range(10)
    ] + [("k2", datetime.datetime(2024, 1, 1, 0, 0, 5))]
    df = spark.createDataFrame(rows, "key string, ts timestamp")
    out = FL.ratelimit(df, 3, ["key"], window="1 minute")
    counts = {r.key: r.c for r in out.groupBy("key").agg(F.count("*").alias("c")).collect()}
    assert counts == {"k1": 3, "k2": 1}


def test_truncate_and_replace(spark):
    df = spark.createDataFrame([("abcdefgh",), ("ab",)], "s string")
    out = E.truncate_fields(df, ["s"], 4)
    rows = out.collect()
    assert rows[0].s == "abcd" and "truncated" in rows[0].flags
    assert rows[1].s == "ab" and rows[1].flags == []
    out2 = E.replace_fields(df, [{"field": "s", "pattern": "ab", "replacement": "XY"}])
    assert out2.first().s == "XYcdefgh"


def test_fingerprint_and_tags(spark):
    df = spark.createDataFrame([("a", 1), ("a", 1), ("b", 2)], "k string, v int")
    out = E.fingerprint(df, ["k", "v"])
    fps = [r.fingerprint for r in out.collect()]
    assert fps[0] == fps[1] != fps[2]
    assert len(fps[0]) == 64
    tagged = E.add_tags(df, ["t1", "t2"])
    assert tagged.first().tags == ["t1", "t2"]


def test_add_fields_merge(spark):
    df = spark.createDataFrame([(1,)], "id int")
    out = E.add_fields(df, {"env": "prod", "dc": "eu"})
    assert out.first().fields.asDict() == {"dc": "eu", "env": "prod"}
    out2 = E.add_fields(out, {"env": "dev", "extra": "x"})
    assert out2.first().fields.asDict() == {"dc": "eu", "env": "dev", "extra": "x"}


def test_drop_fields_nested(spark):
    df = spark.createDataFrame([(1,)], "id int").withColumn(
        "s", F.struct(F.lit("a").alias("x"), F.lit("b").alias("y"),
                      F.lit("c").alias("z"))
    )
    out = FL.drop_fields(df, ["s.x", "s.z"])
    assert out.schema["s"].dataType.fieldNames() == ["y"]
    assert out.first().s.y == "b"


def test_combined_aggregates_matches_separate(routed):
    from beats_spark.pipeline import combined_aggregates

    sink_aggs, rollups = combined_aggregates(routed)
    sep_aggs = sink_aggregates(routed)
    assert sink_aggs.exceptAll(sep_aggs).count() == 0
    assert sep_aggs.exceptAll(sink_aggs).count() == 0
    sep_roll = conv_rollups(routed)
    assert rollups.exceptAll(sep_roll).count() == 0
    assert sep_roll.exceptAll(rollups).count() == 0


def test_script_chain_routes_end_to_end(spark):
    """parse (via a script-composed chain) → enrich → route → fan-out: the
    script composition surface (compiler._compile_script) carries a real
    pipeline, not just unit transforms."""
    from beats_spark.compiler import compile_pipeline
    from beats_spark.routing import route

    df = load_transcripts(spark, SF_SMOKE)
    prog = compile_pipeline([
        {"script": {"processors": [
            {"lowercase": {"fields": ["role"]}},
            {"add_fields": {"fields": {"env": "prod"}, "target": None}},
            {"drop_event": {"when": {"equals": {"role": "system"}}}},
        ]}},
    ])
    routed = route(prog(df), [
        {"when": {"equals": {"role": "assistant"}}, "key": "assistant"},
        {"when": {"contains": {"role": "u"}}, "key": "user"},
    ], default="other")
    counts = {r["_sink"]: r["n"] for r in
              routed.groupBy("_sink").agg(F.count("*").alias("n")).collect()}
    base = {r["role"]: r["n"] for r in
            df.groupBy("role").agg(F.count("*").alias("n")).collect()}
    assert counts.get("assistant", 0) == base.get("assistant", 0)
    assert counts.get("user", 0) == base.get("user", 0)
    assert "system" not in {r["role"] for r in routed.select("role").distinct().collect()}
    assert routed.filter(F.col("env") != "prod").count() == 0
