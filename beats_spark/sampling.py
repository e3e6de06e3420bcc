"""Deterministic sampling for training-data mix construction.

Training pipelines need REPRODUCIBLE sampling: the same document must make
the same keep/drop decision on every run, on any cluster, at any
parallelism — `df.sample()` (seeded per-partition RNG) breaks the moment
partitioning changes. The operators here decide from a cryptographic hash
of the row's stable id + a salt, so decisions are stable under
repartitioning, retries, AND incremental reruns over grown inputs, and the
identical rule renders to DuckDB SQL for the correctness oracle.

Everything is pure Column expressions — map-only, no shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_SPACE = 16 ** 8  # decisions use the first 8 hex chars of md5


def _hex_threshold(rate: float) -> str:
    """8-hex-char threshold such that P[md5_prefix < t] == rate.
    Lowercase-hex string comparison is monotone in the underlying value
    ('0'-'9' < 'a'-'f' in ASCII), so both engines compare identically."""
    n = int(round(min(max(rate, 0.0), 1.0) * _HEX_SPACE))
    return format(min(n, _HEX_SPACE - 1), "08x")


_NULL_ID = "\x00null"  # sentinel so a null id gets ONE well-defined decision


def _decision_hex(id_col: str, salt: str) -> Column:
    # coalesce (not concat_ws null-skipping) so Spark and DuckDB hash the
    # same string for null ids: concat_ws would silently drop the null while
    # the SQL `||` yields NULL — the engines would diverge on null-id rows.
    return F.substring(
        F.md5(
            F.concat(
                F.coalesce(F.col(id_col).cast("string"), F.lit(_NULL_ID)),
                F.lit(":" + salt),
            )
        ),
        1, 8,
    )


def _decision_hex_sql(id_col: str, salt: str) -> str:
    return (
        f"substr(md5(coalesce(CAST({id_col} AS VARCHAR), chr(0) || 'null')"
        f" || ':{salt}'), 1, 8)"
    )


def deterministic_sample(df: DataFrame, rate: float, id_col: str = "doc_id",
                         salt: str = "", target: str = "sampled") -> DataFrame:
    """Flag each row kept iff md5(id:salt) prefix falls under `rate`.
    Different salts give independent samples of the same corpus (held-out
    splits); resolution is 1/2^32."""
    if rate >= 1.0:
        return df.withColumn(target, F.lit(True))
    return df.withColumn(
        target, _decision_hex(id_col, salt) < F.lit(_hex_threshold(rate))
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
    default_rate: float = 0.0,
    target: str = "sampled",
) -> DataFrame:
    """Per-stratum deterministic sampling — the training-data "mix" step:
    each stratum (source / domain / language) keeps its own rate. The rate
    table is compiled INTO the plan as a when-chain (strata counts are
    small: domains, not documents), so the op stays a map-only scan with
    no join at any corpus size."""
    hexv = _decision_hex(id_col, salt)
    pred = F.lit(None).cast("boolean")
    dec = None
    for stratum, rate in sorted(rates.items()):
        this = (
            F.lit(True) if rate >= 1.0
            else hexv < F.lit(_hex_threshold(rate))
        )
        cond = F.col(strata_col) == stratum
        dec = F.when(cond, this) if dec is None else dec.when(cond, this)
    fallback = (
        F.lit(True) if default_rate >= 1.0
        else hexv < F.lit(_hex_threshold(default_rate))
    )
    pred = fallback if dec is None else dec.otherwise(fallback)
    return df.withColumn(target, pred)


def stratified_sample_sql(
    rates: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
    default_rate: float = 0.0,
) -> str:
    """DuckDB fragment computing the identical keep flag."""
    hexv = _decision_hex_sql(id_col, salt)

    def rule(rate: float) -> str:
        if rate >= 1.0:
            return "TRUE"
        return f"{hexv} < '{_hex_threshold(rate)}'"

    whens = " ".join(
        f"WHEN {strata_col} = '{s}' THEN {rule(r)}"
        for s, r in sorted(rates.items())
    )
    return f"CASE {whens} ELSE {rule(default_rate)} END"
