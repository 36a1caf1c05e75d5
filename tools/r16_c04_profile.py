"""c04 component profile (guide §1) for the CURRENT posting-list shape
(r16 restructure; relabeled r17 per ADVICE — the old steps profiled the
removed window-guard form and a cross-pass cache mode that no longer
exists). Per-stage timings at the given SF dir:

  1. tokenize + gram-digest explode (map-side only)
  2. posting fold (one exchange by gram digest + collect_list + DF cap)
  3. sizes branch over a built posting cache
  4. a<b pair stream (posexplode+slice) + pair count aggregation
  5. full c04 per-invocation rebuild (the honest bench unit)

Usage: python tools/r16_c04_profile.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

sf = sys.argv[1] if len(sys.argv) > 1 else "benchdata/sf1"
os.environ["SPARK_GRAFT_SF_DIR"] = sf


def main() -> None:
    from pyspark.sql import functions as F

    from bench import materialize
    from sample_iceberg_schema_evolution_pyiceberg_spark.operators import (
        dedup,
    )
    from sample_iceberg_schema_evolution_pyiceberg_spark.session import (
        get_spark,
    )

    spark = get_spark(
        app_name="c04_profile",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    def timed(label, fn, n=3):
        ts = []
        for _ in range(n):
            sc.setJobDescription(label)
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        ts.sort()
        print(f"{label:46s} median={ts[len(ts)//2]:7.3f}  runs={[round(t,3) for t in ts]}")
        return ts[len(ts) // 2]

    # stats
    gd = dedup._gram_digests_df(spark, sf)
    print("docs:", spark.read.parquet(f"{sf}/documents.parquet").count())
    print("gram rows:", gd.count())
    print("distinct gram digests:", gd.select("g").distinct().count())

    # 1. tokenize + digest explode only (map-side, no shuffle)
    timed("tokenize+digest explode (noop)", lambda: materialize(
        dedup._gram_digests_df(spark, sf)
    ))

    # 2. posting fold: one exchange by g + collect_list + DF cap
    def fold():
        materialize(
            dedup._gram_digests_df(spark, sf)
            .groupBy("g")
            .agg(F.array_sort(F.collect_list("doc_id")).alias("ds"))
            .filter(F.size("ds") <= dedup.C04_MAX_GRAM_DF)
        )

    timed("posting fold (noop)", fold)

    # build one posting cache to time the consumers in isolation
    dedup._release_gram_cache()
    _pairs, posts = dedup._jaccard_pairs(spark, sf)
    posts.count()  # materialize the persist

    # 3. sizes branch over the live cache
    def sizes():
        materialize(
            posts.select(F.explode("ds").alias("doc_id"))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    timed("sizes branch (cache -> noop)", sizes)

    # 4. pair stream + pair count over the live cache
    def pair_stream():
        materialize(
            posts.filter(F.size("ds") >= 2)
            .select(F.posexplode("ds").alias("i", "doc_a"), "ds")
            .select(
                "doc_a",
                F.explode(
                    F.slice("ds", F.col("i") + 2, F.size("ds"))
                ).alias("doc_b"),
            )
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("both"))
        )

    timed("pair stream + count (cache -> noop)", pair_stream)
    print("pair rows:", _pairs.count())
    dedup._release_gram_cache()

    # 5. full c04 per-invocation rebuild — the honest bench unit (each
    # invocation evicts the previous posting cache and rebuilds)
    timed("c04 full (per-invocation rebuild)", lambda: materialize(
        dedup.c04_dedup_ngram_jaccard(spark, sf)
    ))
    spark.stop()


if __name__ == "__main__":
    main()
