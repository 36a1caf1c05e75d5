"""c34 SemDeDup at work decades with a TRAINED codebook (r15, VERDICT
r14 item 7): the r14 cell cap (C34_MAX_CELL_SIZE=4096 contiguous-rank
chunks, similarity.py) was claimed inactive in healthy codebooks but
had no decade measurement. This probe trains the IVF codebook
(train_ivf_codebook) on the decade embeddings, assigns every vector,
and records the cell-size histogram, cap activation count, the
quadratic pair work the cap avoided, and the end-to-end SemDeDup
wall-clock through the capped candidate generator.

Usage:
  python tools/c34_decade_probe.py --sf-dir benchdata/sf1  --sf 1  [--k 16]
  python tools/c34_decade_probe.py --sf-dir benchdata/sf10 --sf 10 --k 16,64,256
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import functions as F

from sample_iceberg_schema_evolution_pyiceberg_spark.operators.similarity import (
    C34_MAX_CELL_SIZE,
    _c34_pair_candidates,
    cosine,
    ivf_assign_udf,
    train_ivf_codebook,
)
from sample_iceberg_schema_evolution_pyiceberg_spark.session import get_spark


def probe(spark, sf_dir: str, k: int) -> dict:
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = e.count()
    t0 = time.time()
    cents = train_ivf_codebook(e, k=k, iters=3)
    train_s = time.time() - t0
    cells = e.withColumn(
        "cell", F.element_at(ivf_assign_udf(1, cents)("embedding"), 1)
    ).select("vec_id", "cell", "embedding")

    sizes = [
        (r["cell"], r["n"])
        for r in cells.groupBy("cell").agg(F.count("*").alias("n")).collect()
    ]
    ns = sorted(s for _, s in sizes)
    over = [s for s in ns if s > C34_MAX_CELL_SIZE]
    # pair work: uncapped = sum C(n_c, 2); capped = per-cell sum over
    # its ceil(n/cap) chunks of C(chunk, 2)
    uncapped = sum(s * (s - 1) // 2 for s in ns)
    capped = 0
    for s in ns:
        full, rem = divmod(s, C34_MAX_CELL_SIZE)
        capped += full * (C34_MAX_CELL_SIZE * (C34_MAX_CELL_SIZE - 1) // 2)
        capped += rem * (rem - 1) // 2

    t1 = time.time()
    n_dropped = (
        _c34_pair_candidates(cells)
        .filter(cosine(F.col("ea"), F.col("eb")) >= 0.3)
        .select(F.col("vb").alias("vec_id"))
        .distinct()
        .count()
    )
    dedup_s = time.time() - t1
    return {
        "k": k,
        "n_vectors": n,
        "train_s": round(train_s, 2),
        "dedup_s": round(dedup_s, 2),
        "n_dropped": n_dropped,
        "cap": C34_MAX_CELL_SIZE,
        "n_cells_nonempty": len(ns),
        "cell_size_min": ns[0],
        "cell_size_p50": ns[len(ns) // 2],
        "cell_size_max": ns[-1],
        "cells_over_cap": len(over),
        "pair_work_uncapped": uncapped,
        "pair_work_capped": capped,
        "pair_work_ratio": round(uncapped / max(capped, 1), 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--k", default="16")
    args = ap.parse_args()
    spark = get_spark()
    out = {
        "probe": "c34_trained_codebook",
        "sf": args.sf,
        "runs": [
            probe(spark, args.sf_dir, int(k))
            for k in str(args.k).split(",")
        ],
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
