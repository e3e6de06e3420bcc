"""Hot-conversation skew demo: plain vs salted aggregation.

Builds a deliberately skewed transcript table (one conversation owns a
large share of all turns — the 'viral thread' shape the north rule calls
out), then times a per-conversation heavy aggregation done (a) naively
(groupBy conv_id: the hot key lands on ONE reducer task) vs (b) with
scale.salted_agg (partial agg over `buckets` salt shards, then combine).

Usage: python tools/skew_bench.py [hot_share] [replicate]
Prints one JSON line; results are recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    hot_share = float(sys.argv[1]) if len(sys.argv) > 1 else 0.3
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from beats_spark.data.transcripts import load_transcripts
    from beats_spark.scale import salted_agg
    from beats_spark.session import get_spark

    spark = get_spark(app_name="skew-bench")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    base = load_transcripts(spark, sf, replicate=replicate)
    n = base.count()
    # reassign hot_share of all rows to ONE conversation id
    skewed = base.withColumn(
        "conv_id",
        F.when(F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(1000))
               < int(hot_share * 1000), F.lit("conv-HOT")).otherwise(F.col("conv_id")),
    ).cache()
    skewed.count()  # materialize

    # NOTE: plain groupBy+sum/count does NOT skew — Spark's hash aggregate
    # pre-combines map-side, so the hot key ships one partial per task
    # (measured: salting such aggs only adds overhead). The skew victim is
    # per-conversation WINDOW work: a window over conv_id must sort the hot
    # conversation's rows inside ONE task. conv-level rollups whose outputs
    # are re-aggregatable can drop the window for a salted two-phase
    # aggregation with identical results — that is the comparison here.
    from pyspark.sql import Window as W

    def windowed():
        w = W.partitionBy("conv_id").orderBy("turn_idx")
        cum = skewed.withColumn(
            "cum_tools",
            F.sum(F.when(F.col("tool") == "bash", 1).otherwise(0)).over(
                w.rowsBetween(W.unboundedPreceding, 0)
            ),
        )
        (
            cum.groupBy("conv_id")
            .agg(F.count("*").alias("n_turns"),
                 F.max("cum_tools").alias("total_tools"),
                 F.sum(F.length("text")).alias("bytes"))
            .write.format("noop").mode("overwrite").save()
        )

    def salted():
        salted_agg(
            skewed,
            ["conv_id"],
            {
                "n_turns": ("sum", F.count("*")),
                "total_tools": ("sum", F.sum(
                    F.when(F.col("tool") == "bash", 1).otherwise(0))),
                "bytes": ("sum", F.sum(F.length("text"))),
            },
            buckets=32,
        ).write.format("noop").mode("overwrite").save()

    for fn in (windowed, salted):  # warm both paths
        fn()
    t = {}
    for name, fn in [("windowed", windowed), ("salted", salted)]:
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        t[name] = round(best, 3)
    skewed.unpersist()
    print(json.dumps({
        "rows": n, "hot_share": hot_share,
        "windowed_sec": t["windowed"], "salted_sec": t["salted"],
        "speedup": round(t["windowed"] / t["salted"], 2),
    }))


if __name__ == "__main__":
    main()
