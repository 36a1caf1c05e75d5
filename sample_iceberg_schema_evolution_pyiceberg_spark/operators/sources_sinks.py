"""Source/sink coverage (SURVEY B3-B5) and SQL-subquery surface:
JSON/CSV scan round-trips, lake overwrite sink, EXISTS / IN / scalar
subqueries via spark.sql."""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query, t


@query(
    "b43_json_scan_roundtrip",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 6)
             AS total
    FROM orders WHERE o_orderkey <= 3000
    GROUP BY o_orderstatus
    """,
)
def b43_json_scan_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """JSON sink + schema'd JSON scan (B5): write a slice as JSON lines,
    read it back with an explicit schema (no inference pass), aggregate.
    Timestamps go through ISO strings — the lossless JSON encoding."""
    src = (
        t(spark, sf, "orders")
        .filter(F.col("o_orderkey") <= 3000)
        .withColumn("o_orderdate", F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"))
    )
    with tempfile.TemporaryDirectory(prefix="json_rt_") as d:
        src.write.mode("overwrite").json(d)
        back = spark.read.schema(src.schema).json(d)
        out = back.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast(
                    "double"
                ),
                6,
            ).alias("total"),
        )
        rows = out.collect()
        # materialize before the temp dir vanishes
        return spark.createDataFrame(rows, out.schema)


@query(
    "b44_csv_scan_roundtrip",
    oracle="""
    SELECT p_brand, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE), 6)
             AS total
    FROM part GROUP BY p_brand
    """,
)
def b44_csv_scan_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """CSV sink + schema'd CSV scan (B5) with header."""
    src = t(spark, sf, "part")
    with tempfile.TemporaryDirectory(prefix="csv_rt_") as d:
        src.write.mode("overwrite").option("header", True).csv(d)
        back = spark.read.schema(src.schema).option("header", True).csv(d)
        out = back.groupBy("p_brand").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("p_retailprice").cast("decimal(18,4)")).cast(
                    "double"
                ),
                6,
            ).alias("total"),
        )
        rows = out.collect()
        # materialize before the temp dir vanishes
        return spark.createDataFrame(rows, out.schema)


@query(
    "b45_lake_overwrite_sink",
    oracle="""
    SELECT COUNT(*) AS n_after_overwrite,
           CAST(SUM(s_suppkey) AS BIGINT) AS key_sum
    FROM supplier WHERE s_acctbal > 0
    """,
)
def b45_lake_overwrite_sink(spark: SparkSession, sf: str) -> DataFrame:
    """Overwrite/replace sink (B4): append the full table, then
    overwrite with the filtered slice — the scan must see only the
    overwrite snapshot."""
    from ..table_format import LakeCatalog  # noqa: PLC0415

    src = t(spark, sf, "supplier")
    with tempfile.TemporaryDirectory(prefix="ow_") as wh:
        cat = LakeCatalog(wh)
        table = cat.create_table("gate", "sup_ow", src.schema)
        table.append(src)
        table.overwrite(src.filter(F.col("s_acctbal") > 0))
        out = table.to_df(spark).agg(
            F.count(F.lit(1)).alias("n_after_overwrite"),
            F.sum("s_suppkey").cast("bigint").alias("key_sum"),
        )
        rows = out.collect()
        # materialize before the temp dir vanishes
        return spark.createDataFrame(rows, out.schema)


def _view(df: DataFrame, prefix: str) -> str:
    name = f"{prefix}_{uuid.uuid4().hex[:8]}"
    df.createOrReplaceTempView(name)
    return name


@query(
    "b46_exists_subquery_sql",
    oracle="""
    SELECT s_nationkey, COUNT(*) AS n
    FROM supplier s
    WHERE EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_nationkey = s.s_nationkey AND c.c_acctbal > 9500)
    GROUP BY s_nationkey
    """,
)
def b46_exists_subquery_sql(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated EXISTS through spark.sql — planned as a left-semi
    join, same engine surface a SQL user hits."""
    s = _view(t(spark, sf, "supplier"), "sup")
    c = _view(t(spark, sf, "customer"), "cust")
    return spark.sql(f"""
        SELECT s_nationkey, COUNT(*) AS n
        FROM {s} s
        WHERE EXISTS (SELECT 1 FROM {c} c
                      WHERE c.c_nationkey = s.s_nationkey
                        AND c.c_acctbal > 9500)
        GROUP BY s_nationkey
    """)


@query(
    "b47_scalar_subquery_sql",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                                      AS DOUBLE) / COUNT(*) * 1.5
                          FROM orders)
    """,
)
def b47_scalar_subquery_sql(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar subquery threshold computed as an exact decimal sum
    divided in double — identical on both engines regardless of
    partition summation order (a raw double AVG is not)."""
    o = _view(t(spark, sf, "orders"), "ord")
    return spark.sql(f"""
        SELECT o_orderkey, o_totalprice
        FROM {o}
        WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                                          AS DOUBLE) / COUNT(*) * 1.5
                              FROM {o})
    """)


@query(
    "b48_in_subquery_sql",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_nationkey IN (SELECT n_nationkey FROM nation
                          WHERE n_regionkey = 0)
      AND c_custkey <= 300
    """,
)
def b48_in_subquery_sql(spark: SparkSession, sf: str) -> DataFrame:
    c = _view(t(spark, sf, "customer"), "cust")
    n = _view(t(spark, sf, "nation"), "nat")
    return spark.sql(f"""
        SELECT c_custkey, c_name FROM {c}
        WHERE c_nationkey IN (SELECT n_nationkey FROM {n}
                              WHERE n_regionkey = 0)
          AND c_custkey <= 300
    """)


@query(
    "b49_cte_sql",
    oracle="""
    WITH big AS (
      SELECT o_custkey, COUNT(*) AS n
      FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 5
    )
    SELECT c.c_mktsegment, COUNT(*) AS n_big
    FROM customer c JOIN big b ON b.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def b49_cte_sql(spark: SparkSession, sf: str) -> DataFrame:
    c = _view(t(spark, sf, "customer"), "cust")
    o = _view(t(spark, sf, "orders"), "ord")
    return spark.sql(f"""
        WITH big AS (
          SELECT o_custkey, COUNT(*) AS n
          FROM {o} GROUP BY o_custkey HAVING COUNT(*) >= 5
        )
        SELECT c.c_mktsegment, COUNT(*) AS n_big
        FROM {c} c JOIN big b ON b.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
    """)


@query(
    "b67_orc_scan_roundtrip",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 6)
             AS sum_qty
    FROM lineitem WHERE l_orderkey <= 2000
    GROUP BY l_returnflag, l_linestatus
    """,
)
def b67_orc_scan_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """ORC sink + scan (B5 family, r14): Spark bundles the ORC
    source natively — columnar with the same predicate-pushdown /
    column-pruning contract as parquet, and the interchange format a
    Hive-lineage warehouse hands this engine. Write a slice as ORC,
    read it back (ORC files carry their own schema — no inference
    pass), aggregate; the oracle reads the original parquet, so the
    ORC encode/decode must be value-lossless."""
    src = (
        t(spark, sf, "lineitem")
        .filter(F.col("l_orderkey") <= 2000)
        .select("l_orderkey", "l_returnflag", "l_linestatus", "l_quantity")
    )
    with tempfile.TemporaryDirectory(prefix="orc_rt_") as d:
        src.write.mode("overwrite").orc(d)
        back = spark.read.orc(d)
        out = back.groupBy("l_returnflag", "l_linestatus").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast(
                    "double"
                ),
                6,
            ).alias("sum_qty"),
        )
        rows = out.collect()
        # materialize before the temp dir vanishes
        return spark.createDataFrame(rows, out.schema)


@query(
    "b68_avro_scan_roundtrip",
    oracle="""
    SELECT l_returnflag,
           CAST(EXTRACT(month FROM l_shipdate) AS INTEGER) AS ship_month,
           COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 6)
             AS sum_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
                      AS DOUBLE), 6) AS sum_price
    FROM lineitem WHERE l_orderkey <= 2000
    GROUP BY l_returnflag, ship_month
    """,
)
def b68_avro_scan_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Avro OCF sink + scan (B5 family, r15) — the last common lake
    ingest format after parquet/JSON/CSV/ORC. No spark-avro jar or
    Python avro package ships in this container, so the repo registers
    its own Spark 4 Python data source (sources/avro_source.py) over
    the pure-Python OCF codec already used for Iceberg manifests
    (avro_ocf.py, cross-checked against the bundled Avro Java library).
    Write a slice distributed (one OCF per task), read it back
    file-parallel (one InputPartition per file; schema from the OCF
    header, no inference pass), aggregate. The slice exercises long,
    int, string, double, decimal (bytes logical type), and
    local-timestamp-micros; the oracle reads the original parquet, so
    the Avro encode/decode must be value-lossless."""
    from ..sources.avro_source import register_avro_ocf  # noqa: PLC0415

    register_avro_ocf(spark)
    src = (
        t(spark, sf, "lineitem")
        .filter(F.col("l_orderkey") <= 2000)
        .select(
            "l_orderkey",
            F.col("l_linenumber").cast("int").alias("l_linenumber"),
            "l_returnflag",
            "l_quantity",
            F.col("l_extendedprice").cast("decimal(18,4)").alias(
                "l_extendedprice"
            ),
            F.col("l_shipdate").cast("timestamp_ntz").alias("l_shipdate"),
        )
    )
    with tempfile.TemporaryDirectory(prefix="avro_rt_") as d:
        target = f"{d}/rows"
        src.repartition(4).write.format("avro_ocf").mode("append").save(target)
        back = spark.read.format("avro_ocf").load(target)
        out = back.groupBy(
            "l_returnflag",
            F.month("l_shipdate").alias("ship_month"),
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast(
                    "double"
                ),
                6,
            ).alias("sum_qty"),
            F.round(F.sum("l_extendedprice").cast("double"), 6).alias(
                "sum_price"
            ),
        )
        rows = out.collect()
        # materialize before the temp dir vanishes
        return spark.createDataFrame(rows, out.schema)


@query(
    "b68b_avro_pruned_scan",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n,
           CAST(SUM(l_orderkey) AS BIGINT) AS sum_key,
           TRUE AS files_pruned
    FROM lineitem WHERE l_orderkey <= 500
    GROUP BY l_returnflag
    """,
)
def b68b_avro_pruned_scan(spark: SparkSession, sf: str) -> DataFrame:
    """Avro source with FILTER-PUSHDOWN file pruning (r15): the writer
    embeds per-column min/max in each OCF header, and the
    ``avro_ocf_pruned`` format's reader implements ``pushFilters`` —
    comparison predicates prune whole files by their stats before any
    decode, with every filter kept residual so Spark re-applies it
    row-level (pruning can only skip files, never change results).
    The episode writes range-partitioned files (disjoint l_orderkey
    ranges per file), asserts the planner actually drops files for a
    selective predicate, and hash-gates the filtered aggregate against
    the parquet oracle."""
    from pyspark.sql.datasource import LessThanOrEqual  # noqa: PLC0415

    from ..sources.avro_source import (  # noqa: PLC0415
        AvroOcfPrunedReader,
        register_avro_ocf,
    )

    register_avro_ocf(spark)
    # scoped conf: pushFilters hard-fails without this flag, but
    # leaving it set would leak a behavior change into every later
    # query on the shared session (r15 advice) — restore on exit
    _pd_key = "spark.sql.python.filterPushdown.enabled"
    try:
        _pd_prev = spark.conf.get(_pd_key)
    except Exception:
        _pd_prev = None
    try:
        spark.conf.set(_pd_key, "true")
        src = (
            t(spark, sf, "lineitem")
            .filter(F.col("l_orderkey") <= 2000)
            .select("l_orderkey", "l_returnflag")
        )
        with tempfile.TemporaryDirectory(prefix="avro_prune_") as d:
            target = f"{d}/rows"
            # range partitioning gives each file a disjoint key
            # interval — the layout a partitioned ingest naturally
            # produces, and what makes min/max stats selective
            src.repartitionByRange(4, "l_orderkey").write.format(
                "avro_ocf"
            ).mode("append").save(target)
            # planner-level proof the stats prune: the same reader
            # Spark instantiates, fed the pushed filter directly
            probe = AvroOcfPrunedReader(target, src.schema)
            probe.pushFilters([LessThanOrEqual(("l_orderkey",), 500)])
            n_kept = len(probe.partitions())
            n_all = len(
                AvroOcfPrunedReader(target, src.schema).partitions()
            )
            pruned = n_kept < n_all
            out = (
                spark.read.format("avro_ocf_pruned")
                .load(target)
                .filter(F.col("l_orderkey") <= 500)
                .groupBy("l_returnflag")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("l_orderkey").alias("sum_key"),
                )
                .withColumn("files_pruned", F.lit(bool(pruned)))
            )
            # materialize before the temp dir vanishes (bounded agg)
            rows = out.collect()
            return spark.createDataFrame(rows, out.schema)
    finally:
        if _pd_prev is None:
            spark.conf.unset(_pd_key)
        else:
            spark.conf.set(_pd_key, _pd_prev)


def read_orc_evolved(spark: SparkSession, path: str) -> DataFrame:
    """ADD-plus-widen evolution read over a heterogeneous ORC
    directory (r16 — VERDICT r15 item 6's ORC half): Spark's native
    ``mergeSchema`` refuses ANY type change (CANNOT_MERGE_SCHEMAS on
    int vs bigint, measured), so this helper implements the same
    evolution contract the Avro source has — fields match by name,
    a field absent from some files null-fills, present fields must
    agree up to the Avro-legal widenings (int->long,
    int/long/float->double; the avro source's lattice is reused),
    anything else refuses loudly.

    Scale shape: per-file footer schemas are read driver-side
    (metadata-priced — ``spark.read.orc(file).schema`` plans without
    scanning); files GROUP BY their schema so the data plane stays
    one columnar scan per distinct schema (not per file), each arm
    projecting a cast/null-fill alignment, arms unioned by name —
    the same per-version-arm shape the lake scan uses."""
    import glob  # noqa: PLC0415
    import os  # noqa: PLC0415

    from pyspark.sql import types as T  # noqa: PLC0415

    from ..sources.avro_source import _widen  # noqa: PLC0415

    files = sorted(glob.glob(os.path.join(path, "*.orc"))) or sorted(
        glob.glob(os.path.join(path, "**", "*.orc"), recursive=True)
    )
    if not files:
        raise FileNotFoundError(f"read_orc_evolved: no .orc under {path}")
    groups: dict[str, tuple[T.StructType, list[str]]] = {}
    for f in files:
        sch = spark.read.orc(f).schema  # footer only, no scan
        key = sch.simpleString()
        if key in groups:
            groups[key][1].append(f)
        else:
            groups[key] = (sch, [f])
    # widened union across the distinct schemas
    union: dict[str, T.DataType] = {}
    for sch, _fs in groups.values():
        for fld in sch.fields:
            prev = union.get(fld.name)
            if prev is None:
                union[fld.name] = fld.dataType
            elif prev != fld.dataType:
                wide = _widen(prev, fld.dataType)
                if wide is None:
                    raise ValueError(
                        f"read_orc_evolved: field {fld.name!r} is "
                        f"{prev.simpleString()} in one file and "
                        f"{fld.dataType.simpleString()} in another — "
                        "not an Avro-legal widening, type conflicts "
                        "are not merged"
                    )
                union[fld.name] = wide
    out = None
    for sch, fs in groups.values():
        have = {f.name for f in sch.fields}
        arm = spark.read.orc(*fs).select(
            *[
                (
                    F.col(name).cast(dt)
                    if name in have
                    else F.lit(None).cast(dt)
                ).alias(name)
                for name, dt in union.items()
            ]
        )
        out = arm if out is None else out.unionByName(arm)
    return out


@query(
    "b67b_orc_evolved_scan",
    # the oracle replays both evolution slices from the original
    # parquet: the int->long widened key aggregates identically, the
    # added column null-fills on pre-evolution rows
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(l_orderkey) AS BIGINT) AS sum_key,
           COUNT(l_linestatus2) AS n_with_status
    FROM (
      SELECT l_returnflag, l_orderkey,
             CAST(NULL AS VARCHAR) AS l_linestatus2
      FROM lineitem WHERE l_orderkey <= 1000
      UNION ALL
      SELECT l_returnflag, l_orderkey, l_linestatus AS l_linestatus2
      FROM lineitem WHERE l_orderkey > 1000 AND l_orderkey <= 2000
    )
    GROUP BY l_returnflag
    """,
)
def b67b_orc_evolved_scan(spark: SparkSession, sf: str) -> DataFrame:
    """ORC evolution read (r16): slice 1 written with l_orderkey as
    INT and no second status column; slice 2 written post-evolution
    with the key widened to LONG and the column added.
    ``read_orc_evolved`` reads the heterogeneous directory under the
    widened union schema (key long, added column null-filled on
    slice-1 rows) — Spark's native mergeSchema refuses this exact layout."""
    base = t(spark, sf, "lineitem").select(
        "l_returnflag", "l_orderkey",
        F.col("l_linestatus").alias("l_linestatus2"),
    )
    with tempfile.TemporaryDirectory(prefix="orc_evo_") as d:
        base.filter("l_orderkey <= 1000").selectExpr(
            "l_returnflag", "cast(l_orderkey as int) l_orderkey"
        ).coalesce(1).write.orc(f"{d}/s1")
        base.filter(
            "l_orderkey > 1000 AND l_orderkey <= 2000"
        ).selectExpr(
            "l_returnflag", "cast(l_orderkey as long) l_orderkey",
            "l_linestatus2",
        ).coalesce(1).write.orc(f"{d}/s2")
        import glob  # noqa: PLC0415
        import os  # noqa: PLC0415
        import shutil  # noqa: PLC0415

        dd = f"{d}/all"
        os.makedirs(dd)
        for i, f in enumerate(
            sorted(glob.glob(f"{d}/s1/*.orc"))
            + sorted(glob.glob(f"{d}/s2/*.orc"))
        ):
            shutil.copy(f, f"{dd}/part-{i:04d}.orc")
        back = read_orc_evolved(spark, dd)
        out = back.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_orderkey").alias("sum_key"),
            F.count("l_linestatus2").alias("n_with_status"),
        )
        rows = out.collect()
        # materialize before the temp dir vanishes (bounded agg)
        return spark.createDataFrame(rows, out.schema)


@query(
    "b68c_avro_widened_scan",
    # same closed form as b67b, over the Avro source's widening path
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(l_orderkey) AS BIGINT) AS sum_key,
           ROUND(CAST(SUM(qty) AS DOUBLE), 6) AS sum_qty,
           COUNT(l_linestatus2) AS n_with_status
    FROM (
      SELECT l_returnflag, l_orderkey,
             CAST(l_quantity AS DOUBLE) AS qty,
             CAST(NULL AS VARCHAR) AS l_linestatus2
      FROM lineitem WHERE l_orderkey <= 1000
      UNION ALL
      SELECT l_returnflag, l_orderkey,
             CAST(l_quantity AS DOUBLE),
             l_linestatus
      FROM lineitem WHERE l_orderkey > 1000 AND l_orderkey <= 2000
    )
    GROUP BY l_returnflag
    """,
)
def b68c_avro_widened_scan(spark: SparkSession, sf: str) -> DataFrame:
    """Avro evolution read with WIDENING promotions (r16 — VERDICT
    r15 item 6): slice 1 written with the key as INT and quantity as
    FLOAT, no second status column; slice 2 post-evolution with the
    key widened to LONG, quantity to DOUBLE, and the column added.
    ``.option("mergeschema", "true")`` infers the widened union
    (int->long, float->double are Avro schema-resolution promotions;
    sources/avro_source._PROMOTIONS) with per-file value casts and
    null-fill — where r15's merge was ADD-only and refused the type
    change."""
    from ..sources.avro_source import register_avro_ocf  # noqa: PLC0415

    register_avro_ocf(spark)
    base = t(spark, sf, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_quantity",
        F.col("l_linestatus").alias("l_linestatus2"),
    )
    with tempfile.TemporaryDirectory(prefix="avro_widen_") as d:
        base.filter("l_orderkey <= 1000").selectExpr(
            "l_returnflag",
            "cast(l_orderkey as int) l_orderkey",
            "cast(l_quantity as float) l_quantity",
        ).coalesce(1).write.format("avro_ocf").mode("append").save(
            f"{d}/rows"
        )
        base.filter(
            "l_orderkey > 1000 AND l_orderkey <= 2000"
        ).selectExpr(
            "l_returnflag",
            "cast(l_orderkey as long) l_orderkey",
            "cast(l_quantity as double) l_quantity",
            "l_linestatus2",
        ).coalesce(1).write.format("avro_ocf").mode("append").save(
            f"{d}/rows"
        )
        back = (
            spark.read.format("avro_ocf")
            .option("mergeschema", "true")
            .load(f"{d}/rows")
        )
        out = back.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_orderkey").alias("sum_key"),
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.count("l_linestatus2").alias("n_with_status"),
        )
        rows = out.collect()
        # materialize before the temp dir vanishes (bounded agg)
        return spark.createDataFrame(rows, out.schema)
