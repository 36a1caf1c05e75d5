"""BPE training at a REALISTIC vocabulary (r16 — VERDICT r15 item 7).

The r14 sf1 point (0.14x vs the DuckDB replay) carried an honest
caveat: the synthetic corpus has a ~40-word vocabulary, so the
per-iteration pair aggregation was trivially small. This probe
removes the caveat: it synthesizes a corpus with >= 10k DISTINCT
words (deterministic base-alphabet encodings of a zipf-ish id stream,
so words share character structure and merges are meaningful), trains
``train_bpe_merges`` at several merge counts, and records wall-clock
plus the claim under test — per-iteration aggregated state is
VOCABULARY-sized (distinct segmentations), never corpus-sized, and
driver state is exactly n_merges rows.

Usage: python tools/bpe_vocab_bench.py [--docs 50000] [--words 100]
         [--vocab 20000] [--merges 8 16 32]
Writes bench_results/bpe_vocab_r16.json and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import sys

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=50_000)
    ap.add_argument("--words", type=int, default=100)
    ap.add_argument("--vocab", type=int, default=20_000)
    ap.add_argument("--merges", type=int, nargs="+", default=[8, 16, 32])
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from sample_iceberg_schema_evolution_pyiceberg_spark.operators.text import (
        _bpe_vocab,
        train_bpe_merges,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .appName("bpe_vocab_bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Deterministic synthetic corpus: doc i holds `words` words, each
    # word the base-20 letter encoding of a zipf-ish id — xxhash64
    # spreads positions, the modulo-square skews low ids heavy (a
    # vocabulary with a fat head and a long tail, like text).
    V = args.vocab
    docs = (
        spark.range(args.docs)
        .select(
            F.col("id").alias("doc_id"),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(0), F.lit(args.words - 1)),
                    lambda j: F.concat(
                        F.lit("w"),
                        # id in [0, V): square a uniform draw for skew
                        F.conv(
                            F.format_string(
                                "%x",
                                (
                                    F.pmod(
                                        F.xxhash64(F.col("id") * 1000 + j),
                                        F.lit(V),
                                    )
                                    * F.pmod(
                                        F.xxhash64(
                                            F.col("id") * 1000 + j + 7
                                        ),
                                        F.lit(V),
                                    )
                                )
                                % F.lit(V),
                            ),
                            16,
                            20,
                        ),
                    ),
                ),
                " ",
            ).alias("text"),
        )
        .persist()
    )
    n_docs = docs.count()  # materialize the corpus before timing
    vocab_n = _bpe_vocab(docs).count()

    points = []
    for m in args.merges:
        t0 = time.time()
        merges, seg = train_bpe_merges(docs, n_merges=m)
        # force the final segmentation (the apply-side input)
        seg_rows = seg.count()
        wall = time.time() - t0
        points.append(
            {
                "n_merges_requested": m,
                "n_merges_found": len(merges),
                "train_plus_seg_sec": round(wall, 3),
                "seg_rows_is_vocab_sized": seg_rows == vocab_n,
                "top_merge": merges[0]["merged"] if merges else None,
            }
        )
        print(json.dumps(points[-1]))

    out = {
        "probe": "bpe_vocab_r16",
        "docs": n_docs,
        "words_per_doc": args.words,
        "distinct_words": vocab_n,
        "points": points,
    }
    Path("bench_results").mkdir(exist_ok=True)
    Path("bench_results/bpe_vocab_r16.json").write_text(
        json.dumps(out, indent=2)
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
