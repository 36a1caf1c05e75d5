"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary query at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 via
the package's operator registry; ``oracle_sql()`` returns the DuckDB
equivalents (queries without an entry get the driver's rows-only
check — approximate/streaming/engine-RNG ops, flagged in SURVEY §2).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sample_iceberg_schema_evolution_pyiceberg_spark.operators import (
    ORACLES,
    QUERIES,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["b12_agg_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
