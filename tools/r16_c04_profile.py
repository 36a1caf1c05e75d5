"""c04 component profile (guide §1): cold vs warm, tokenize vs guard vs
pair join, at the given SF dir. Usage:
  python tools/r16_c04_profile.py [sf_dir]
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
    from pyspark.sql.window import Window

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
        print(f"{label:44s} median={ts[len(ts)//2]:7.3f}  runs={[round(t,3) for t in ts]}")
        return ts[len(ts) // 2]

    # stats
    g_raw = dedup._grams_df(spark, sf)
    print("docs:", spark.read.parquet(f"{sf}/documents.parquet").count())
    print("gram rows:", g_raw.count())
    print("distinct grams:", g_raw.select("gram").distinct().count())

    # 1. tokenize+explode only (no shuffle)
    timed("tokenize+explode (noop)", lambda: materialize(dedup._grams_df(spark, sf)))

    # 2. + window DF guard (one shuffle by gram)
    def guard():
        g = (
            dedup._grams_df(spark, sf)
            .withColumn("_df", F.count(F.lit(1)).over(Window.partitionBy("gram")))
            .filter(F.col("_df") <= dedup.C04_MAX_GRAM_DF)
            .drop("_df")
        )
        materialize(g)

    timed("tokenize + window guard (noop)", guard)

    # 3. full c04 COLD (cache evicted before each run)
    def full_cold():
        dedup._release_gram_cache()
        spark.catalog.clearCache()
        materialize(dedup.c04_dedup_ngram_jaccard(spark, sf))

    timed("c04 full COLD (evict cache each run)", full_cold)

    # 4. full c04 WARM (cache reused across runs — inherited bench mode)
    materialize(dedup.c04_dedup_ngram_jaccard(spark, sf))
    timed("c04 full WARM (cache reused)", lambda: materialize(
        dedup.c04_dedup_ngram_jaccard(spark, sf)
    ))

    # 5. pair-join only over the live cache
    pairs, g = dedup._jaccard_pairs(spark, sf)
    print("pair rows:", pairs.count())
    spark.stop()


if __name__ == "__main__":
    main()
