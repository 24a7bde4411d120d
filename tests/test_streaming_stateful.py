"""applyInPandasWithState streaming dedup: cross-micro-batch exactly-once."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_streaming_dedup_across_batches(spark, tmp_path):
    from octocode_spark.datagen import sequences
    from octocode_spark.streaming.stateful import streaming_dedup

    base = sequences(spark, 200, max_tok_cap=32).select("doc_id", "n_tok", "source")
    landing = str(tmp_path / "landing")
    # batch 1: rows 0..199; batch 2: the SAME rows again (duplicates) plus
    # fresh rows 200..249 — two files so maxFilesPerTrigger=1 splits batches
    base.coalesce(1).write.mode("append").parquet(landing)
    extra = (
        sequences(spark, 250, max_tok_cap=32)
        .filter("cast(substring(doc_id, -12, 12) as long) >= 200")
        .select("doc_id", "n_tok", "source")
    )
    base.unionByName(extra).coalesce(1).write.mode("append").parquet(landing)

    stream = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    deduped = streaming_dedup(stream, key="doc_id")
    q = (
        deduped.writeStream.outputMode("append").format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.table("dedup_out")
    assert out.count() == 250  # every key exactly once, duplicates dropped
    assert out.select("doc_id").distinct().count() == 250


def test_ivf_topk_recall(spark):
    import numpy as np

    from octocode_spark.operators.ann import brute_force_topk, ivf_topk

    rng = np.random.RandomState(11)
    base = rng.randn(4, 16) * 3
    rows = []
    vid = 0
    for c in range(4):
        for _ in range(40):
            rows.append((vid, [float(x) for x in base[c] + rng.randn(16) * 0.1]))
            vid += 1
    vecs = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>").cache()
    qv = [float(x) for x in base[1]]
    exact = {r["vec_id"] for r in brute_force_topk(vecs, qv, k=10).collect()}
    approx = {r["vec_id"] for r in ivf_topk(vecs, qv, k=10, n_clusters=4, n_probe=1).collect()}
    assert len(exact & approx) >= 8  # tight clusters → near-perfect recall
