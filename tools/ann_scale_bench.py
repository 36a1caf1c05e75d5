"""ANN at a work-dominated scale: recall/latency of the IVF index
(similarity.py c06c/c06d path) against the brute-force oracle on a
1 M x 64-dim fixture — the measurement VERDICT r9 item 6 asks for
(the c06 family's only prior evidence was planted-recall pytest at
~120 docs).

Fixture: 1,000,000 unit-norm vectors from a seeded 256-component
Gaussian mixture (real cluster structure, so IVF has geometry to
learn), written once to benchdata/ann1m/embeddings.parquet in chunks.

Protocol (all engine-side, Arrow-batched — no driver loops over data):
- 32 held-out query vectors (generated from the same mixture, ids < 0
  so they never collide with corpus ids).
- Ground truth: exact cosine top-10 per query via ONE corpus pass —
  mapInPandas computes a (batch x 32) matmul and emits only each
  batch's local top-10 per query (candidates = #batches x 32 x 10
  rows), then a global window takes the true top-10. This IS the
  scalable brute shape: per-partition top-k then tiny global top-k.
- IVF: spherical-KMeans codebook (k=1024) trained on a 100k sample
  (train_ivf_codebook, 2 Lloyd iterations), corpus assigned once
  (the partition-key column a 100 TB deployment would write at
  ingest), then probe-N in {1, 4, 16}: candidates = corpus rows in
  the N cells nearest each query, exact cosine on candidates only,
  recall@10 vs the ground truth + wall-clock vs the brute pass.

Usage: python tools/ann_scale_bench.py [--out bench_results/ann_1m_r10.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

DIM = 64
N_VECS = 1_000_000
N_COMPONENTS = 256
N_QUERIES = 32
TOPK = 10
K_CENTROIDS = 1024
FIXTURE = Path("benchdata/ann1m/embeddings.parquet")


def build_fixture() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(20260815)
    comps = rng.normal(size=(N_COMPONENTS, DIM))
    comps /= np.linalg.norm(comps, axis=1, keepdims=True)
    FIXTURE.parent.mkdir(parents=True, exist_ok=True)
    schema = pa.schema(
        [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32()))]
    )
    chunk = 100_000
    with pq.ParquetWriter(FIXTURE, schema) as w:
        for lo in range(0, N_VECS, chunk):
            n = min(chunk, N_VECS - lo)
            which = rng.integers(0, N_COMPONENTS, size=n)
            v = comps[which] + 0.15 * rng.normal(size=(n, DIM))
            v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            w.write_table(
                pa.table(
                    {
                        "vec_id": pa.array(
                            range(lo, lo + n), type=pa.int64()
                        ),
                        "embedding": pa.array(
                            v.astype(np.float32).tolist(),
                            type=pa.list_(pa.float32()),
                        ),
                    }
                )
            )
    print(f"fixture built: {FIXTURE} ({N_VECS} x {DIM})", flush=True)


def queries_matrix() -> np.ndarray:
    """Held-out queries from the same mixture (seeded, disjoint
    stream)."""
    rng = np.random.default_rng(715)
    comps_rng = np.random.default_rng(20260815)
    comps = comps_rng.normal(size=(N_COMPONENTS, DIM))
    comps /= np.linalg.norm(comps, axis=1, keepdims=True)
    which = rng.integers(0, N_COMPONENTS, size=N_QUERIES)
    q = comps[which] + 0.15 * rng.normal(size=(N_QUERIES, DIM))
    return q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)


def brute_topk(spark, df, qm: np.ndarray):
    """One-pass exact top-K per query: per-batch matmul + local top-K
    inside mapInPandas, global top-K over the tiny candidate set."""
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    nq = qm.shape[0]

    def _local(batches):
        for pdf in batches:
            m = np.stack(
                pdf["embedding"].apply(
                    lambda v: np.asarray(v, dtype=np.float64)
                )
            )
            m /= np.maximum(
                np.linalg.norm(m, axis=1, keepdims=True), 1e-12
            )
            sims = m @ qm.T  # (batch, nq)
            k = min(TOPK, sims.shape[0])
            idx = np.argpartition(-sims, k - 1, axis=0)[:k]
            out = {
                "qid": np.repeat(np.arange(nq), k),
                "vec_id": pdf["vec_id"].to_numpy()[idx.T.ravel()],
                "cos_sim": np.take_along_axis(
                    sims, idx, axis=0
                ).T.ravel(),
            }
            yield pd.DataFrame(out)

    cand = df.mapInPandas(_local, "qid int, vec_id long, cos_sim double")
    w = Window.partitionBy("qid").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOPK)
        .select("qid", "vec_id", "cos_sim")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if not FIXTURE.exists():
        build_fixture()

    os.environ.setdefault("SPARK_GRAFT_SF_DIR", str(FIXTURE.parent))
    from pyspark.sql import functions as F

    from sample_iceberg_schema_evolution_pyiceberg_spark.operators.similarity import (
        cosine,
        ivf_assign_udf,
        train_ivf_codebook,
    )
    from sample_iceberg_schema_evolution_pyiceberg_spark.session import get_spark

    spark = get_spark(app_name="ann_scale_bench")
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(str(FIXTURE))
    qm = queries_matrix()

    # ---- ground truth + brute wall-clock (median of 3, 1 warm) ----
    truth_df = brute_topk(spark, df, qm)
    truth_rows = truth_df.collect()
    samples = []
    for _ in range(3):
        t0 = time.time()
        brute_topk(spark, df, qm).count()
        samples.append(time.time() - t0)
    brute_sec = round(sorted(samples)[1], 3)
    truth = {}
    for r in truth_rows:
        truth.setdefault(r.qid, set()).add(r.vec_id)
    print(f"brute: {brute_sec}s for {N_QUERIES} queries", flush=True)

    # ---- IVF: train once, assign once (the ingest-time cost) ----
    t0 = time.time()
    cb = train_ivf_codebook(
        df.sample(0.1, seed=7), k=K_CENTROIDS, iters=2
    )
    train_sec = round(time.time() - t0, 1)
    t0 = time.time()
    assigned = df.withColumn(
        "cell", F.element_at(ivf_assign_udf(1, cb)("embedding"), 1)
    )
    assigned.write.mode("overwrite").partitionBy("cell").parquet(
        str(FIXTURE.parent / "assigned.parquet")
    )
    assign_sec = round(time.time() - t0, 1)
    indexed = spark.read.parquet(str(FIXTURE.parent / "assigned.parquet"))
    print(f"ivf: train {train_sec}s, assign {assign_sec}s", flush=True)

    # query cells per probe depth, computed driver-side from the
    # codebook (model params: nq x k matmul)
    qsims = qm @ cb.T

    results = {}
    for probe in (1, 4, 16):
        qcells = np.argsort(-qsims, axis=1)[:, :probe]
        qrows = [
            (int(qi), [float(x) for x in qm[qi]], int(c))
            for qi in range(N_QUERIES)
            for c in qcells[qi]
        ]
        qdf = spark.createDataFrame(
            qrows, "qid int, qvec array<float>, cell int"
        )

        cells = sorted({int(c) for row in qcells for c in row})

        def run():
            from pyspark.sql import Window

            # the cell list is driver-known (model-parameter matmul):
            # filter BEFORE the join so Catalyst partition-prunes the
            # cell-partitioned index - the probe reads only the probed
            # cells' files, the actual IVF IO contract
            cand = indexed.filter(F.col("cell").isin(cells)).join(
                F.broadcast(qdf), "cell"
            )
            w = Window.partitionBy("qid").orderBy(
                F.col("cos_sim").desc(), F.col("vec_id")
            )
            return (
                cand.select(
                    "qid",
                    "vec_id",
                    cosine(F.col("embedding"), F.col("qvec")).alias(
                        "cos_sim"
                    ),
                )
                .withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= TOPK)
                .select("qid", "vec_id")
            )

        got_rows = run().collect()
        samples = []
        for _ in range(3):
            t0 = time.time()
            run().count()
            samples.append(time.time() - t0)
        got = {}
        for r in got_rows:
            got.setdefault(r.qid, set()).add(r.vec_id)
        recalls = [
            len(got.get(q, set()) & truth[q]) / TOPK for q in truth
        ]
        rows_touched = run().sparkSession.createDataFrame(
            [], "x int"
        ) and indexed.filter(F.col("cell").isin(cells)).count()
        results[f"probe_{probe}"] = {
            "recall_at_10": round(float(np.mean(recalls)), 4),
            "recall_min": round(float(np.min(recalls)), 4),
            "sec": round(sorted(samples)[1], 3),
            "speedup_vs_brute": round(brute_sec / sorted(samples)[1], 1),
            "rows_touched": rows_touched,
            "corpus_frac": round(rows_touched / N_VECS, 4),
        }
        print(f"probe {probe}: {results[f'probe_{probe}']}", flush=True)

    record = {
        "metric": "ann_ivf_recall_latency",
        "n_vectors": N_VECS,
        "dim": DIM,
        "n_queries": N_QUERIES,
        "k_centroids": K_CENTROIDS,
        "brute_sec": brute_sec,
        "train_sec": train_sec,
        "assign_sec": assign_sec,
        "probes": results,
    }
    line = json.dumps(record)
    print(line)
    if args.out:
        Path(args.out).write_text(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
