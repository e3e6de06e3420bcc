"""Custom stateful streaming operators via applyInPandasWithState.

The exact token-bucket rate limiter (reference:
/root/reference/libbeat/processors/ratelimit/token_bucket.go:90-100 —
continuous refill, per-key bucket) is inherently sequential per key; the
batch engine approximates it with windowed top-N (operators/filter.py). In
streaming, per-key sequential state is exactly what
applyInPandasWithState provides, so here the semantics are faithful:
state = (tokens, last_refill_ts) per key, rows processed in event-time
order, bucket refilled continuously at `rate_per_sec` up to `burst`.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_cache_enrich(
    tdf: DataFrame,
    key_col: str,
    op_col: str,
    value_col: str,
    target_col: str = "cached_value",
    ts_col: str = "ts",
    ttl_seconds: float | None = None,
):
    """The cache processor as a stateful streaming operator (reference:
    /root/reference/libbeat/processors/cache/config.go:26-108 — put
    stores {key → value, ts}, get enriches from the store, entries expire
    after TTL). State is the per-key (value, stored_ts) pair in the state
    store, so puts in one micro-batch enrich gets in later ones — the
    ordering guarantee the batch join flavor (enrich.cache_put +
    misc.cache_get) cannot give.

    Rows with op_col=='put' update state (and pass through, target null);
    rows with 'get' emit the cached value if fresh, else null.
    """
    out_schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in tdf.schema)
        + f", {target_col} string"
    )
    state_schema = "value string, stored_ts double"

    def fn(key, pdfs, state: GroupState):
        value, stored = state.get if state.exists else (None, float("-inf"))
        outs = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            col = []
            for op, v, t in zip(pdf[op_col], pdf[value_col], pdf[ts_col]):
                now = t.timestamp()
                if op == "put":
                    value, stored = v, now
                    col.append(None)
                else:  # get
                    fresh = value is not None and (
                        ttl_seconds is None or now - stored <= ttl_seconds
                    )
                    col.append(value if fresh else None)
            pdf = pdf.copy()
            pdf[target_col] = col
            outs.append(pdf)
        if value is not None:
            # never seed state for a key with no put yet — a ('', -inf)
            # sentinel would pass the `value is not None` freshness check on
            # later micro-batches and make gets emit '' instead of null
            state.update((value, stored))
        yield pd.concat(outs)

    return tdf.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def token_bucket_limit(
    tdf: DataFrame,
    key_cols: list[str],
    rate_per_sec: float,
    burst: int,
    ts_col: str = "ts",
):
    """Streaming rate limit: emits only rows that acquire a token.

    Output schema = input schema. State per key survives micro-batches via
    the state store (checkpointed — resumable like every stage here).
    """
    schema = tdf.schema
    state_schema = "tokens double, last_ts double"

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            tokens, last_ts = state.get
        else:
            tokens, last_ts = float(burst), float("-inf")
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            keep = []
            for t in pdf[ts_col]:
                now = t.timestamp()
                if last_ts != float("-inf") and now > last_ts:
                    tokens = min(float(burst), tokens + (now - last_ts) * rate_per_sec)
                last_ts = max(last_ts, now)
                if tokens >= 1.0:
                    tokens -= 1.0
                    keep.append(True)
                else:
                    keep.append(False)
            out.append(pdf[pd.Series(keep, index=pdf.index)])
        state.update((tokens, last_ts))
        yield pd.concat(out) if out else pd.DataFrame(columns=[f.name for f in schema])

    return (
        tdf.groupBy(*key_cols)
        .applyInPandasWithState(
            fn,
            outputStructType=schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
