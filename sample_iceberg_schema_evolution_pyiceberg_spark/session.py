"""SparkSession factory tuned for the engine.

Defaults mirror a 100 TB-scale posture scaled down to local mode: AQE on
(runtime re-planning, skew-join handling, partition coalescing),
broadcast threshold left at Spark's default so small dims broadcast,
Arrow enabled for the Pandas-UDF paths, and NTZ timestamp inference so
parquet naive timestamps round-trip unchanged (DuckDB-oracle parity).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "sample-iceberg-schema-evolution-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    On a real cluster the same conf applies unchanged; only ``master``
    differs. ``SPARK_GRAFT_CPUS`` controls local parallelism (driver
    contract, see ``bench.py``).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        # testdata events.parquet carries TIMESTAMP(NANOS); Spark has no
        # nanos timestamp — read as long, converted in sources.load_table
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # testdata ships one parquet file per table; split small files
        # so scans parallelize (at cluster scale inputs have thousands
        # of splits and 128m is right — these are local-bench values)
        .config("spark.sql.files.maxPartitionBytes", "2m")
        .config("spark.sql.files.openCostInBytes", "512k")
        # dims under 64 MB broadcast; 100 TB fact sides never qualify
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
