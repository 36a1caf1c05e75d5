"""c04 (exact n-gram Jaccard) decade probe — VERDICT r12 item 4: the
gram-DF cap's linearity claim was measured at sf1 only; this measures
the capped operator at an arbitrary decade and records the numbers the
claim is made of:

- max gram document-frequency and the count of grams the cap drops;
- ACTUAL pair-join input work (sum over kept grams of C(df,2)) vs the
  PROJECTED uncapped pair work (same sum over all grams) — both from
  the DF histogram, no quadratic join needed to know the blowup;
- wall-clock of the full capped c04 (1 warmup + median of 3).

Usage: python tools/c04_decade_probe.py --sf-dir benchdata/sf10 --sf 10
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from sample_iceberg_schema_evolution_pyiceberg_spark.operators.dedup import (
        C04_MAX_GRAM_DF,
        _grams_df,
    )
    from sample_iceberg_schema_evolution_pyiceberg_spark.operators import (
        QUERIES,
    )
    from sample_iceberg_schema_evolution_pyiceberg_spark.session import get_spark

    spark = get_spark(app_name="c04_decade_probe")
    spark.sparkContext.setLogLevel("ERROR")

    # DF histogram: pair work is fully determined by it — C(df,2) per
    # gram — so the uncapped blowup is quantified WITHOUT running the
    # quadratic join this cap exists to prevent.
    df_hist = (
        _grams_df(spark, args.sf_dir)
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .select(
            F.max("df").alias("max_df"),
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("df") > C04_MAX_GRAM_DF, 1).otherwise(0)).alias(
                "grams_dropped"
            ),
            F.sum(F.expr("df * (df - 1) / 2")).alias("pair_rows_uncapped"),
            F.sum(
                F.when(
                    F.col("df") <= C04_MAX_GRAM_DF,
                    F.expr("df * (df - 1) / 2"),
                ).otherwise(0)
            ).alias("pair_rows_capped"),
        )
        .collect()[0]
        .asDict()
    )
    print("df histogram:", json.dumps(df_hist, default=int), flush=True)

    def run() -> float:
        t0 = time.time()
        d = QUERIES["c04_dedup_ngram_jaccard"](spark, args.sf_dir)
        n = d.count()
        return time.time() - t0, n

    wall, n_pairs = run()  # warmup (also localCheckpoint-materialized)
    samples = []
    for _ in range(args.runs):
        w, n_pairs = run()
        samples.append(w)
    record = {
        "metric": "c04_capped_decade",
        "sf": args.sf,
        "cap": C04_MAX_GRAM_DF,
        **{k: int(v) for k, v in df_hist.items()},
        "result_pairs": int(n_pairs),
        "wall_median": round(sorted(samples)[len(samples) // 2], 3),
        "wall_min": round(min(samples), 3),
        "wall_max": round(max(samples), 3),
        "warmup": round(wall, 3),
    }
    line = json.dumps(record)
    print(line)
    if args.out:
        Path(args.out).write_text(line + "\n")


if __name__ == "__main__":
    main()
