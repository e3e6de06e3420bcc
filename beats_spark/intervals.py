"""Range (interval) join: match point events to the intervals that cover
them — maintenance windows, sessions, incident spans.

Spark executes a raw `ts BETWEEN lo AND hi` join as a
BroadcastNestedLoopJoin (small side) or falls off a cliff at scale; there
is no native interval join. The scalable formulation used here is
bucketization:

1. pick a bucket width B (seconds) on the order of the typical interval
   length;
2. each interval explodes into the buckets it touches
   (`sequence(floor(lo/B), floor(hi/B))` — an interval of length L lands
   in ceil(L/B)+1 buckets, so the blow-up is bounded and chosen);
3. each event computes its single bucket `floor(ts/B)`;
4. a plain shuffled EQUI-join on (key…, bucket) finds every candidate
   pair exactly once (an event's bucket is touched by every interval
   covering it, and by no interval twice), and the residual
   `lo <= ts <= hi` filter runs post-join, codegen.

The plan is Exchange + SortMergeJoin/shuffled-hash on bare
(key, bucket) — never a nested loop — and both sides prune columns to the
scan. Same family as the banded LSH joins in dedup.py: turn a range
predicate into an equality on a derived coarse key, verify exactly after.

No analogue in mjwolf/beats (stateless per-event processors); this is the
log-analytics range primitive (cf. Structured Streaming's interval join
and DuckDB's ASOF/range joins).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, TimestampNTZType, TimestampType


def _epoch(df: DataFrame, col: str) -> Column:
    """Column as epoch seconds: timestamps via unix_timestamp (ANSI mode
    forbids a direct timestamp→bigint cast), numerics via cast."""
    if isinstance(
        df.schema[col].dataType, (TimestampType, TimestampNTZType, DateType)
    ):
        return F.unix_timestamp(F.col(col))
    return F.col(col).cast("long")


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    events_ts: str = "ts",
    lo: str = "lo",
    hi: str = "hi",
    on: list[str] | str | None = None,
    bucket: int = 3600,
    values: list[str] | None = None,
) -> DataFrame:
    """Inner join of point `events` to every `intervals` row covering them:
    same `on` key (optional) and ``lo <= events_ts <= hi`` inclusive.

    Timestamp/bound columns may be TimestampType (cast to epoch seconds
    internally) or already-numeric. `values` defaults to every interval
    column that is not a key or bound; names must not collide with event
    columns. Each matching (event, interval) pair is emitted exactly once.
    `bucket` is the bucketization width in seconds — choose it near the
    typical interval length (too small explodes long intervals into many
    buckets, too large inflates the candidate join)."""
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    if values is None:
        values = [c for c in intervals.columns if c not in (*keys, lo, hi)]
    collide = set(values) & set(events.columns)
    if collide:
        raise ValueError(
            f"interval value columns collide with event columns: {collide}"
        )

    b = F.lit(int(bucket))
    ivl = intervals.select(
        *keys,
        _epoch(intervals, lo).alias("_ilo"),
        _epoch(intervals, hi).alias("_ihi"),
        *values,
    ).where(F.col("_ilo") <= F.col("_ihi"))
    ivl = ivl.withColumn(
        "_bkt",
        F.explode(
            F.sequence(F.floor(F.col("_ilo") / b), F.floor(F.col("_ihi") / b))
        ),
    )
    ev = events.withColumn("_ets", _epoch(events, events_ts)).withColumn(
        "_bkt", F.floor(F.col("_ets") / b)
    )
    out = ev.join(ivl, [*keys, "_bkt"]).where(
        (F.col("_ilo") <= F.col("_ets")) & (F.col("_ets") <= F.col("_ihi"))
    )
    return out.drop("_bkt", "_ets", "_ilo", "_ihi")


def validity_intervals(
    states: DataFrame,
    on: list[str] | str,
    ts: str = "ts",
    lo: str = "valid_from",
    hi: str = "valid_to",
) -> DataFrame:
    """Change-log → SCD2 validity spans: each state row becomes valid from
    its own timestamp until the key's NEXT state (exclusive; null = still
    current). The inverse of `asof_join` — materialize the spans once with
    one lead() window per key and every point lookup afterwards is a plain
    `interval_join`, instead of re-running the as-of window per query.

    One shuffle on the key; rows and columns pass through with `lo`/`hi`
    appended (same type as `ts`)."""
    keys = [on] if isinstance(on, str) else list(on)
    w = Window.partitionBy(*keys).orderBy(F.col(ts).asc())
    return states.withColumn(lo, F.col(ts)).withColumn(
        hi, F.lead(ts).over(w)
    )
