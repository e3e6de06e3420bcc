"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship parse → enrich → route → aggregate pipeline
on sf0.001. `queries()` / `oracle_sql()` expose every implemented operator
with a DuckDB oracle (see beats_spark/queries.py for the registry; oracles
share compiled regexes / condition SQL / lookup VALUES with the engine so
there is one source of truth per operator).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from beats_spark.pipeline import full_pipeline, sink_aggregates

    routed = full_pipeline(spark, "/root/testdata/sf0.001")
    return sink_aggregates(routed)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from beats_spark import queries as Q

    return Q.queries()


def oracle_sql() -> dict[str, str]:
    from beats_spark import queries as Q

    return Q.oracle_sql()
