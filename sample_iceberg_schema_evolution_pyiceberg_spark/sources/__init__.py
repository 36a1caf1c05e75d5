"""Source readers (SURVEY B1-B5): parquet testdata tables, schema'd
CSV/JSON, binary files, and lake-format tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def ensure_session_confs(spark: SparkSession) -> None:
    """The driver may hand us a session built without our factory
    (session.py); these four confs are semantics-bearing (oracle
    parity), runtime-settable, and idempotent — set them on every
    table load."""
    for k, v in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.parquet.inferTimestampNTZ.enabled", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.adaptive.enabled", "true"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:  # noqa: BLE001 — a locked conf is non-fatal
            pass


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table (B1 parquet scan). ``events`` carries a
    TIMESTAMP(NANOS) column Spark can't represent: read as long ns (see
    session.py nanosAsLong) and truncate to micros — identical to
    DuckDB's nanosecond-parquet read, keeping oracle parity."""
    ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)")
        )
    return df


def read_json(spark: SparkSession, path: str, schema: T.StructType | str) -> DataFrame:
    """Schema'd JSON scan (B5) — explicit schema, no inference pass
    (inference is a full extra read at 100 TB)."""
    return spark.read.schema(schema).json(path)


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType | str, header: bool = True
) -> DataFrame:
    """Schema'd CSV scan (B5)."""
    return spark.read.schema(schema).option("header", header).csv(path)


def read_binary_files(spark: SparkSession, path: str) -> DataFrame:
    """Binary-file source (C5 multimodal): path, modificationTime,
    length, content:binary."""
    return spark.read.format("binaryFile").load(path)
