"""asof_join (beats_spark/asof.py): point-in-time enrichment semantics —
backward as-of with >= ties, left-join nulls, tolerance aging, and the
no-join-node plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beats_spark.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    ev = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 21, "e"), (2, 15, "c"), (3, 5, "d")],
        "k int, ts int, x string",
    )
    st = spark.createDataFrame(
        [(1, 5, 100), (1, 20, 200), (2, 99, 300)], "k int, ts int, v int"
    )
    return ev, st


def test_backward_asof_with_ge_ties(spark, frames):
    ev, st = frames
    got = {
        (r.k, r.ts): r.v
        for r in asof_join(ev, st, on="k", values=["v"]).collect()
    }
    # strictly-before state
    assert got[(1, 10)] == 100
    # state stamped AT the event instant is visible (>= convention,
    # matches DuckDB ASOF JOIN and pandas merge_asof backward)
    assert got[(1, 20)] == 200
    # later event still sees the carried state
    assert got[(1, 21)] == 200
    # no state at-or-before -> left-join null
    assert got[(2, 15)] is None
    assert got[(3, 5)] is None


def test_event_columns_and_count_preserved(spark, frames):
    ev, st = frames
    out = asof_join(ev, st, on="k", values=["v"])
    assert out.count() == ev.count()
    assert set(out.columns) == {"k", "ts", "x", "v"}


def test_tolerance_nulls_stale_state(spark, frames):
    ev, st = frames
    got = {
        (r.k, r.ts): r.v
        for r in asof_join(
            ev, st, on="k", values=["v"], tolerance=F.lit(8)
        ).collect()
    }
    assert got[(1, 10)] == 100   # age 5 <= 8
    assert got[(1, 20)] == 200   # age 0
    assert got[(1, 21)] == 200   # age 1
    assert got[(2, 15)] is None


def test_default_values_and_collision_error(spark, frames):
    ev, st = frames
    # default values = every non-key non-ts state column
    assert "v" in asof_join(ev, st, on="k").columns
    with pytest.raises(ValueError, match="collide"):
        asof_join(ev, st.withColumnRenamed("v", "x"), on="k")


def test_plan_has_no_join_node(spark, frames):
    ev, st = frames
    df = asof_join(ev, st, on="k", values=["v"])
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted")
    )
    for node in ("SortMergeJoin", "BroadcastHashJoin",
                 "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert node not in plan
    assert "Window" in plan


def test_asof_matches_bruteforce_on_random_data(spark):
    """200 keys × random events/states in ONE job vs an O(n·m) per-key
    brute force — catches window-frame and tie-ordering mistakes the
    hand-picked vectors might miss."""
    import random

    rnd = random.Random(20260818)
    evs, sts = [], []
    for k in range(200):
        for ts in rnd.sample(range(1000), rnd.randint(1, 8)):
            evs.append((k, ts))
        for ts in rnd.sample(range(1000), rnd.randint(0, 6)):
            sts.append((k, ts, k * 10_000 + ts))
    ev = spark.createDataFrame(evs, "k int, ts int")
    st = spark.createDataFrame(sts, "k int, ts int, v long")

    got = {
        (r.k, r.ts): r.v
        for r in asof_join(ev, st, on="k", values=["v"]).collect()
    }
    by_key: dict[int, list[tuple[int, int]]] = {}
    for k, ts, v in sts:
        by_key.setdefault(k, []).append((ts, v))
    assert len(got) == len(evs)
    for k, ts in evs:
        prior = [(sts_, v) for sts_, v in by_key.get(k, []) if sts_ <= ts]
        want = max(prior)[1] if prior else None
        assert got[(k, ts)] == want, (k, ts)
