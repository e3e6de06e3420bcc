"""The flagship parse → enrich → route → aggregate DAG over transcripts.

This is the Spark restatement of the Beats data path (SURVEY.md §3.1):
scan → processor program (ordered column transforms) → routing selector →
per-sink fan-out + aggregates. Program order is preserved as column
dependency order; Catalyst fuses the whole parse+enrich stage into one
WholeStageCodegen span around a single Arrow UDF exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from beats_spark.data.lookups import role_lookup_df, tool_lookup_df
from beats_spark.data.transcripts import load_transcripts
from beats_spark.operators import enrich as E
from beats_spark.operators import parse as P
from beats_spark.routing import route

# The grok bank for the three transcript text templates
# (beats_spark/data/transcripts.py). First match wins.
TRANSCRIPT_PATTERNS = [
    # logfmt template
    r"^level=%{LOGLEVEL:level} ts=%{TIMESTAMP_ISO8601:event_time} "
    r"caller=%{NOTSPACE:caller} msg=\"%{DATA:msg}\" value=%{INT:value:long} "
    r"took=%{INT:took_ms:long}ms$",
    # apache-access template
    r"^%{IPV4:client_ip} %{USER:ident} %{USER:auth} \[%{TIMESTAMP_ISO8601:event_time}\] "
    r"\"%{WORD:method} %{URIPATH:path} HTTP/%{NUMBER:http_version}\" "
    r"%{INT:status:int} %{INT:size:long}$",
    # plain prose template
    r"^user %{INT:uid:long} did %{WORD:action} with props %{GREEDYDATA:props_json}$",
]

# Routing rules (first-match-wins; SURVEY.md §2.7). The corrupt→deadletter
# rule implements the dead-letter route (elasticsearch/client.go:490-543).
ROUTING_RULES = [
    {"when": {"contains": {"text": "!!corrupt"}}, "key": "deadletter"},
    {"when": {"equals": {"role": "tool"}}, "key": "sink-tools"},
    {"when": {"regexp": {"text": '(level=ERROR|" 500 )'}}, "key": "sink-errors"},
    {"key": "events-%{[role]}"},
]


def parse_stage(tdf: DataFrame) -> DataFrame:
    """Grok pattern bank over text; failures get flags + stay for routing."""
    return P.grok(tdf, TRANSCRIPT_PATTERNS, field="text", target_prefix="parsed")


def enrich_stage(df: DataFrame) -> DataFrame:
    """Broadcast-join lookups + deterministic id — no shuffle of the fact side."""
    spark = df.sparkSession
    df = E.translate(df, role_lookup_df(spark), "role",
                     defaults={"role_group": "unknown", "priority": 0})
    df = E.translate(df, tool_lookup_df(spark), "tool",
                     defaults={"tool_kind": "none", "billable": False})
    df = E.add_id(df)
    return df


def route_stage(df: DataFrame) -> DataFrame:
    return route(df, ROUTING_RULES)


def full_pipeline(spark: SparkSession, sf_dir: str, replicate: int = 1) -> DataFrame:
    """transcripts → parse → enrich → route; returns the routed event table."""
    return route_stage(
        enrich_stage(parse_stage(load_transcripts(spark, sf_dir, replicate=replicate)))
    )


def sink_aggregates(routed: DataFrame) -> DataFrame:
    """Per-sink per-role aggregate counts — the per-sink turn/tool-call counts
    from the north rule (≅ pipeline monitoring counters,
    publisher/pipeline/monitoring.go:24-179).

    Exact-distinct via the mid-grain two-stage shape (same plan as
    combined_aggregates): aggregate once at (_sink, role, conv_id), then
    count mid-grain rows per (_sink, role). No Expand node — the
    countDistinct rewrite's expand measured 1.5× slower at 16 cores, and
    test_plans.py asserts its absence."""
    mid = routed.groupBy("_sink", "role", "conv_id").agg(
        F.count("*").alias("_tc"),
        F.sum(
            F.when(
                F.col("tool").isNotNull() & (F.col("tool") != "") & (F.col("tool") != "none"),
                1,
            ).otherwise(0)
        ).alias("_tcc"),
    )
    return mid.groupBy("_sink", "role").agg(
        F.sum("_tc").alias("turn_count"),
        F.sum("_tcc").alias("tool_call_count"),
        F.count("*").alias("n_convs"),
    )


def combined_aggregates(written: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Per-sink aggregates AND conversation rollups from ONE scan: the big
    input is aggregated once at the mid-grain (_sink, role, conv_id), and
    both outputs re-aggregate that tiny intermediate. count(DISTINCT
    conv_id) becomes a plain count over mid-grain rows — exact, with no
    distinct-expand (a GROUPING SETS + countDistinct variant measured 1.5×
    slower at 16 cores from the expand blowup). The mid-grain intermediate
    (~|sinks|×|roles|×|convs| rows — tiny next to the input) is persisted
    so the two branch aggregations run one input scan between them; callers
    running repeatedly should clearCache()/unpersist when done."""
    mid = written.groupBy("_sink", "role", "conv_id").agg(
        F.count("*").alias("turn_count"),
        F.sum(
            F.when(
                F.col("tool").isNotNull() & (F.col("tool") != "") & (F.col("tool") != "none"),
                1,
            ).otherwise(0)
        ).alias("tool_call_count"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    ).persist()
    sink_aggs = mid.groupBy("_sink", "role").agg(
        F.sum("turn_count").alias("turn_count"),
        F.sum("tool_call_count").alias("tool_call_count"),
        F.count("*").alias("n_convs"),
    )
    rollups = mid.groupBy("conv_id").agg(
        F.sum("turn_count").alias("n_turns"),
        F.min("first_ts").alias("first_ts"),
        F.max("last_ts").alias("last_ts"),
        F.sum("tool_call_count").alias("total_tool_calls"),
    )
    return sink_aggs, rollups


def conv_rollups(df: DataFrame) -> DataFrame:
    """Conversation-level rollups via window over (conv_id, turn_idx)."""
    w = W.partitionBy("conv_id").orderBy("turn_idx")
    cum = df.withColumn(
        "cum_tool_calls",
        F.sum(
            F.when(
                F.col("tool").isNotNull() & (F.col("tool") != "") & (F.col("tool") != "none"),
                1,
            ).otherwise(0)
        ).over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return cum.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.max("cum_tool_calls").alias("total_tool_calls"),
    )
