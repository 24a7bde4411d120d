"""In-cell latency evidence for the rq1 Hamming pre-rank (round-4 verdict
ask #7): the disclosed design divergence — no HNSW-style in-cell graph
(reference pairs IVF with HNSW inside partitions, vector_optimizer.rs:52) —
rests on the claim that the packed-code Hamming pre-rank (xor + bit_count,
whole-stage codegen) holds the in-cell latency floor down as cells grow, so
a per-query graph traversal (driver-hostile in Spark's execution model) is
not needed. This script MEASURES that claim at two cell sizes on the same
corpus: the same probed-vector count searched through ~8x bigger cells, with
recall@10 against exact brute force.

Usage: python tools/bench_incell.py  →  one JSON line; paste into BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = int(os.environ.get("INCELL_ROWS", "120000"))
DIM = 64
K = 10
QUERIES = 8


def make_corpus(spark):
    """Deterministic clustered corpus: 16 gaussian modes (seeded numpy),
    so IVF cells carry real structure and recall is a meaningful number."""
    import numpy as np

    rng = np.random.RandomState(42)
    centers = rng.randn(16, DIM).astype(np.float32) * 3.0
    assign = rng.randint(0, 16, size=N_ROWS)
    vecs = centers[assign] + rng.randn(N_ROWS, DIM).astype(np.float32)
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(N_ROWS)]
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<float>"), vecs


def main() -> None:
    from octocode_spark import get_spark
    from octocode_spark.lakehouse.vector_index import (
        ivf_search_persisted,
        load_ivf_index,
        persist_ivf_index,
    )
    from octocode_spark.operators.ann import brute_force_topk, build_ivf_index

    spark = get_spark(app="incell-bench", cpus=int(os.environ.get("INCELL_CPUS", "16")),
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    corpus, vecs = make_corpus(spark)
    corpus = corpus.cache()
    corpus.count()

    q_ids = [int(i * (N_ROWS // QUERIES) + 7) for i in range(QUERIES)]
    qvs = {i: [float(x) for x in vecs[i]] for i in q_ids}
    exact = {
        i: [r["vec_id"] for r in brute_force_topk(corpus, qvs[i], K).collect()]
        for i in q_ids
    }

    out = {"rows": N_ROWS, "dim": DIM, "k": K, "queries": QUERIES, "tiers": {}}
    tmp = tempfile.mkdtemp(prefix="incell_")
    try:
        # two cell sizes, SAME probed-vector budget: small cells probe 8 of
        # 32 (~30k vectors), big cells probe 1 of 4 (~30k vectors) — so the
        # comparison isolates "one big cell vs several small ones", i.e.
        # exactly the in-cell cost the HNSW analog would amortize
        for tag, n_clusters, n_probe, qmode in (
            ("cells32_probe8", 32, 8, "rq1"),
            ("cells4_probe1", 4, 1, "rq1"),
            ("cells32_probe8_centered", 32, 8, "rq1c"),
            ("cells4_probe1_centered", 4, 1, "rq1c"),
        ):
            index = build_ivf_index(corpus, n_clusters=n_clusters, cache=False)
            root = os.path.join(tmp, tag)
            persist_ivf_index(index, root, quantize=qmode)
            handle = load_ivf_index(root)
            lat, rec, probed = [], [], []
            for rep in range(2):  # rep 0 = warmup (codegen+footers), rep 1 measured
                for i in q_ids:
                    t0 = time.monotonic()
                    hits = ivf_search_persisted(
                        spark, handle, qvs[i], k=K, n_probe=n_probe,
                        rerank_vectors=corpus,  # shortlist: adaptive default
                    ).collect()
                    dt = time.monotonic() - t0
                    if rep:
                        lat.append(dt)
                        got = [r["vec_id"] for r in hits]
                        rec.append(len(set(got) & set(exact[i])) / K)
            from pyspark.sql import functions as F

            sizes = sorted(
                r["n"]
                for r in index.assigned.groupBy("_cell")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
            out["tiers"][tag] = {
                "n_clusters": n_clusters,
                "n_probe": n_probe,
                "avg_cell_rows": round(N_ROWS / n_clusters),
                "cell_rows_minmax": [sizes[0], sizes[-1]] if sizes else None,
                "latency_ms_mean": round(1000 * sum(lat) / len(lat), 1),
                "latency_ms_max": round(1000 * max(lat), 1),
                "recall_at_10": round(sum(rec) / len(rec), 3),
            }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
