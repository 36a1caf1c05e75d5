"""Measure scd2_apply's O(open-history + range) claim (VERDICT r8
item 7), in the apply_changelog style (SCALE.md): hold the OPEN
history and the new changelog range constant, grow the CLOSED history
10x, and record wall time plus the apply's total shuffle-write bytes
— the scale-honest metric, since the one window in scd2_apply is the
only exchange and the claim is precisely that closed intervals never
enter it (they pass through as a scan-union, priced like any
column-pruned scan, never reshuffled).

History is built from a synthetic changelog via scd2_history and
localCheckpoint'ed first, so construction cost is isolated from the
apply (same isolation the apply_changelog measurement used). Shuffle
bytes come from the Spark UI REST API (localhost), diffed across the
apply's jobs.

Usage: python tools/scd2_apply_scale.py
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

KEYS = 10_000
DELTA_KEYS = 500  # keys touched by the new range: 1 delete + 1 insert


def shuffle_write_bytes(spark: SparkSession) -> int:
    base = f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[1]}"
    apps = json.load(urllib.request.urlopen(f"{base}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}/stages")
    )
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def make_changelog(spark: SparkSession, keys: int, versions: int):
    """Per key: versions alternating insert/delete, last insert open.
    Ordinals: version i inserts at 2i, is deleted at 2i+1 (except the
    last, which stays open). Data payload: a ~200-byte attribute blob
    so shuffle bytes mean something."""
    base = spark.range(keys).select(F.col("id").alias("k"))
    v = spark.range(versions).select(F.col("id").alias("ver"))
    rows = base.crossJoin(v)
    inserts = rows.select(
        "k",
        F.concat(F.lit("attrs-"), F.col("k"), F.lit("-v"), F.col("ver"),
                 F.lit("-" + "x" * 180)).alias("payload"),
        (F.col("ver") * 2).alias("_change_ordinal"),
        F.concat(F.lit("s"), F.col("ver") * 2).alias("_snapshot_id"),
        F.lit("insert").alias("_change_type"),
    )
    deletes = rows.filter(F.col("ver") < versions - 1).select(
        "k",
        F.concat(F.lit("attrs-"), F.col("k"), F.lit("-v"), F.col("ver"),
                 F.lit("-" + "x" * 180)).alias("payload"),
        (F.col("ver") * 2 + 1).alias("_change_ordinal"),
        F.concat(F.lit("s"), F.col("ver") * 2 + 1).alias("_snapshot_id"),
        F.lit("delete").alias("_change_type"),
    )
    return inserts.unionByName(deletes), versions * 2


def main() -> None:
    import os

    os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from sample_iceberg_schema_evolution_pyiceberg_spark.session import get_spark
    from sample_iceberg_schema_evolution_pyiceberg_spark.table_format import (
        scd2_apply,
        scd2_history,
    )

    spark = get_spark(app_name="scd2_apply_scale", extra_conf={
        "spark.ui.enabled": "true",  # REST /stages is the bytes source
        "spark.ui.retainedStages": "10000",
    })
    spark.sparkContext.setLogLevel("ERROR")

    # constant new range: close + reopen DELTA_KEYS keys
    results = []
    for versions in (10, 100):
        changelog, next_ord = make_changelog(spark, KEYS, versions)
        history = scd2_history(changelog, ["k"]).localCheckpoint()
        n_hist = history.count()
        n_open = history.filter("is_current").count()

        delta = spark.range(DELTA_KEYS).select(F.col("id").alias("k"))
        new_events = delta.select(
            "k",
            F.concat(F.lit("attrs-"), F.col("k"), F.lit("-vNEW"),
                     F.lit("-" + "x" * 180)).alias("payload"),
            F.lit(0).alias("_change_ordinal"),
            F.lit("sN0").alias("_snapshot_id"),
            F.lit("delete").alias("_change_type"),
        ).unionByName(delta.select(
            "k",
            F.concat(F.lit("attrs-"), F.col("k"), F.lit("-vNEW"),
                     F.lit("-" + "x" * 180)).alias("payload"),
            F.lit(1).alias("_change_ordinal"),
            F.lit("sN1").alias("_snapshot_id"),
            F.lit("insert").alias("_change_type"),
        )).localCheckpoint()

        # warmup once (codegen/page-cache), then measure. Materialize
        # via noop write (all columns survive to the sink) — a count()
        # would let Catalyst prune the payload off the exchange and
        # measure an empty shuffle.
        from bench import materialize
        out = scd2_apply(history, new_events, ["k"], next_ord).count()
        materialize(scd2_apply(history, new_events, ["k"], next_ord))
        samples, sh = [], []
        for _ in range(3):
            b0 = shuffle_write_bytes(spark)
            t0 = time.time()
            materialize(scd2_apply(history, new_events, ["k"], next_ord))
            samples.append(time.time() - t0)
            sh.append(shuffle_write_bytes(spark) - b0)
        results.append({
            "versions": versions,
            "history_rows": n_hist,
            "open_rows": n_open,
            "delta_events": DELTA_KEYS * 2,
            "out_rows": out,
            "wall_median": round(sorted(samples)[1], 3),
            "shuffle_write_bytes_median": sorted(sh)[1],
        })
        print(json.dumps(results[-1]), flush=True)

    r0, r1 = results
    print(json.dumps({
        "closed_growth": round(
            (r1["history_rows"] - r1["open_rows"])
            / (r0["history_rows"] - r0["open_rows"]), 2),
        "shuffle_ratio": round(
            r1["shuffle_write_bytes_median"]
            / max(1, r0["shuffle_write_bytes_median"]), 2),
        "wall_ratio": round(r1["wall_median"] / r0["wall_median"], 2),
    }))


if __name__ == "__main__":
    main()
