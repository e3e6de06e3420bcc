"""interval_join (beats_spark/intervals.py): coverage semantics (inclusive
bounds, exactly-once pairs, bucket-boundary spans), key scoping, and the
no-nested-loop plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beats_spark.intervals import interval_join


@pytest.fixture(scope="module")
def frames(spark):
    ev = spark.createDataFrame(
        [(1, 100, "a"), (1, 250, "b"), (1, 999, "c"), (2, 100, "d")],
        "k int, ts long, x string",
    )
    iv = spark.createDataFrame(
        [
            (1, 90, 110, "w1"),     # covers ts=100 (inclusive bounds)
            (1, 100, 100, "w2"),    # degenerate interval, covers ts=100
            (1, 0, 500, "w3"),      # long span, covers 100 and 250
            (2, 240, 260, "w4"),    # right key range, wrong key for b
        ],
        "k int, lo long, hi long, w string",
    )
    return ev, iv


def _pairs(df):
    return sorted((r.x, r.w) for r in df.collect())


def test_coverage_inclusive_and_exactly_once(spark, frames):
    ev, iv = frames
    out = interval_join(ev, iv, on="k", bucket=50)
    assert _pairs(out) == [
        ("a", "w1"), ("a", "w2"), ("a", "w3"), ("b", "w3"),
    ]


def test_bucket_width_does_not_change_results(spark, frames):
    ev, iv = frames
    small = _pairs(interval_join(ev, iv, on="k", bucket=7))
    huge = _pairs(interval_join(ev, iv, on="k", bucket=100_000))
    assert small == huge


def test_keyless_join_crosses_keys(spark, frames):
    ev, iv = frames
    out = interval_join(ev.drop("k"), iv.drop("k"), bucket=50)
    # without the key, d(ts=100) now also matches w1/w2/w3, and b matches w4
    got = sorted((r.x, r.w) for r in out.collect())
    assert ("d", "w1") in got and ("b", "w4") in got


def test_collision_guard(spark, frames):
    ev, iv = frames
    with pytest.raises(ValueError, match="collide"):
        interval_join(ev, iv.withColumnRenamed("w", "x"), on="k")


def test_plan_is_equi_join_not_nested_loop(spark, frames):
    ev, iv = frames
    df = interval_join(ev, iv, on="k", bucket=50)
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted")
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_matches_bruteforce_on_random_data(spark):
    """150 keys × random events/intervals in ONE job vs the O(n·m)
    definition — bucket boundaries land everywhere, so any off-by-one in
    the sequence/floor bucketization shows up."""
    import random

    rnd = random.Random(20260818)
    evs, ivs = [], []
    for k in range(150):
        for ts in rnd.sample(range(2000), rnd.randint(1, 6)):
            evs.append((k, ts))
        for i in range(rnd.randint(0, 4)):
            lo = rnd.randrange(2000)
            ivs.append((k, lo, lo + rnd.randrange(0, 400), f"w{k}-{i}"))
    ev = spark.createDataFrame(evs, "k int, ts long")
    iv = spark.createDataFrame(ivs, "k int, lo long, hi long, w string")

    got = sorted(
        (r.k, r.ts, r.w)
        for r in interval_join(ev, iv, on="k", bucket=64).collect()
    )
    want = sorted(
        (k, ts, w)
        for k, ts in evs
        for k2, lo, hi, w in ivs
        if k2 == k and lo <= ts <= hi
    )
    assert got == want


def test_validity_intervals_tile_the_timeline(spark):
    """SCD2 spans: per key, valid_from asc, each valid_to equals the next
    valid_from (half-open tiling), exactly one open (null) span — and an
    interval_join against the closed spans reproduces asof semantics."""
    from beats_spark.intervals import validity_intervals

    st = spark.createDataFrame(
        [(1, 5, 100), (1, 20, 200), (1, 40, 300), (2, 7, 900)],
        "k int, ts long, v long",
    )
    spans = validity_intervals(st, on="k", ts="ts").collect()
    by_key: dict[int, list] = {}
    for r in sorted(spans, key=lambda r: (r.k, r.valid_from)):
        by_key.setdefault(r.k, []).append(r)
    for k, rows in by_key.items():
        assert rows[-1].valid_to is None
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to == b.valid_from
    # spans compose directly with closed="left": half-open boundaries and
    # the open (null valid_to) span both resolve — asof semantics exactly
    spans_df = validity_intervals(st, on="k", ts="ts").select(
        "k", F.col("valid_from").alias("lo"), F.col("valid_to").alias("hi"), "v"
    )
    ev = spark.createDataFrame(
        [(1, 5), (1, 19), (1, 20), (1, 25), (1, 99), (2, 7)],
        "k int, ts long",
    )
    joined = interval_join(ev, spans_df, on="k", bucket=16, closed="left")
    got = {(r.k, r.ts): r.v for r in joined.collect()}
    # every event matches exactly one span: boundary ts=20 → the NEW state,
    # ts=99 → key 1's open span, key 2's only (open) span covers ts=7
    assert joined.count() == len(got) == 6
    assert got == {(1, 5): 100, (1, 19): 100, (1, 20): 200,
                   (1, 25): 200, (1, 99): 300, (2, 7): 900}


def test_half_open_matches_bruteforce_with_open_spans(spark):
    """closed="left": lo <= ts < hi, null hi = still-open span matching
    every ts >= lo — brute-force comparison over random data."""
    import random

    rnd = random.Random(20260819)
    evs, ivs = [], []
    for k in range(80):
        for ts in rnd.sample(range(1000), rnd.randint(1, 5)):
            evs.append((k, ts))
        for i in range(rnd.randint(0, 3)):
            lo = rnd.randrange(1000)
            hi = None if rnd.random() < 0.3 else lo + rnd.randrange(0, 300)
            ivs.append((k, lo, hi, f"w{k}-{i}"))
    ev = spark.createDataFrame(evs, "k int, ts long")
    iv = spark.createDataFrame(ivs, "k int, lo long, hi long, w string")

    got = sorted(
        (r.k, r.ts, r.w)
        for r in interval_join(ev, iv, on="k", bucket=64,
                               closed="left").collect()
    )
    want = sorted(
        (k, ts, w)
        for k, ts in evs
        for k2, lo, hi, w in ivs
        if k2 == k and lo <= ts and (hi is None or ts < hi)
    )
    assert got == want


def test_closed_both_drops_null_hi_and_rejects_bad_mode(spark):
    ev = spark.createDataFrame([(1, 10)], "k int, ts long")
    iv = spark.createDataFrame([(1, 0, None, "open")],
                               "k int, lo long, hi long, w string")
    assert interval_join(ev, iv, on="k").count() == 0  # documented "both"
    with pytest.raises(ValueError, match="closed"):
        interval_join(ev, iv, on="k", closed="right")
