"""Query registry: every declared operator (SURVEY.md §2) registers a
PySpark callable and, when SQL-expressible, a DuckDB oracle string.

Determinism & oracle-parity rules applied throughout (SURVEY.md §5):
- money aggregates computed in DECIMAL (exact), final cast to a fixed
  decimal(38,6) or double identically on both sides;
- averages emitted as one double division over exact operands;
- LIMIT always carries a total order with a unique tiebreak key;
- timestamps leave as DATE or formatted strings, never raw;
- column names aliased identically in Spark and SQL (driver sorts
  columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a (spark, sf_dir) -> DataFrame callable; ``oracle`` is
    the DuckDB-equivalent SQL (omit for non-SQL-expressible ops — the
    driver then records a weaker rows-only check)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..sources import load_table  # noqa: PLC0415

    return load_table(spark, sf_dir, name)
