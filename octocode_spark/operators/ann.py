"""Similarity search over an embedding column (`embeddings` table:
vec_id, embedding array<float>, label).

- brute-force cosine top-k: `F.zip_with` dot product + TakeOrderedAndProject —
  the correctness baseline (reference ANN analog, src/store/mod.rs:817-878).
- LSH-bucketed variant: random-hyperplane signs → bucket equi-join → exact
  re-rank inside buckets. The scale path: candidate set is per-bucket, never
  the full corpus.
- all-pairs near-dup by cosine ≥ τ, bucket-blocked.

The hyperplanes are derived from xxhash64 with literal seeds, so results are
deterministic at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_sim(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    vectors: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine: one scan, per-partition partial top-k
    (TakeOrderedAndProject — no full sort, no full shuffle)."""
    q = F.array(*[F.lit(float(x)) for x in query])
    qn = sum(x * x for x in query) ** 0.5
    sim = _dot(F.col(vec_col).cast("array<double>"), q) / (_norm(F.col(vec_col).cast("array<double>")) * F.lit(qn))
    return (
        vectors.select(F.col(id_col), F.round(sim, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _hyperplane_sign(vec: Column, plane_seed: int, dim: int) -> Column:
    """Sign of <v, r> where r is a deterministic ±1 hyperplane from xxhash of
    (seed, position). ±1 planes make the signature SQL-expressible."""
    signs = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.when(F.pmod(F.xxhash64(F.lit(plane_seed), i), F.lit(2)) == 0, F.lit(1.0)).otherwise(F.lit(-1.0)),
    )
    return (F.aggregate(F.zip_with(vec, signs, lambda x, s: x * s), F.lit(0.0), lambda a, v: a + v) >= 0)


def lsh_signature(vec_col: str, dim: int, num_planes: int = 16) -> Column:
    """num_planes-bit random-hyperplane signature packed into a long."""
    v = F.col(vec_col).cast("array<double>")
    bits = [
        F.when(_hyperplane_sign(v, p, dim), F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
        for p in range(num_planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_topk(
    vectors: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 12,
    probe_hamming: int = 2,
) -> DataFrame:
    """ANN: restrict the exact re-rank to vectors whose signature is within
    ``probe_hamming`` bits of the query's (multi-probe LSH)."""
    dim = len(query)
    sigged = vectors.withColumn("_sig", lsh_signature(vec_col, dim, num_planes))
    qsig_row = (
        vectors.sparkSession.range(1)
        .select(lsh_signature_literal(query, num_planes).alias("s"))
        .collect()[0]
    )
    qsig = qsig_row["s"]
    cand = sigged.filter(F.bit_count(F.col("_sig").bitwiseXOR(F.lit(qsig))) <= probe_hamming)
    return brute_force_topk(cand, query, k, id_col, vec_col)


def lsh_signature_literal(vec: list[float], num_planes: int) -> Column:
    arr = F.array(*[F.lit(float(x)) for x in vec])
    sig = F.lit(0).cast("long")
    for p in range(num_planes):
        sig = sig + F.when(_hyperplane_sign(arr, p, len(vec)), F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def ivf_topk(
    vectors: DataFrame,
    query: list[float],
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: k-means coarse quantizer → probe the n_probe nearest
    centroids → exact cosine re-rank inside those cells only.

    The scale path for 10^9+ vectors: the assignment column becomes a
    partition key, so a query scans n_probe/n_clusters of the corpus.
    KMeans seed is fixed — same index layout on every build.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = vectors.select(
        F.col(id_col), F.col(vec_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("_feat"),
    )
    km = KMeans(k=n_clusters, seed=42, featuresCol="_feat", predictionCol="_cell")
    model = km.fit(feat)
    assigned = model.transform(feat).select(id_col, vec_col, "_cell")

    import numpy as np

    q = np.asarray(query, dtype=float)
    centroids = model.clusterCenters()
    dists = [float(np.linalg.norm(c - q)) for c in centroids]
    probe_cells = sorted(range(len(dists)), key=lambda i: dists[i])[:n_probe]
    cand = assigned.filter(F.col("_cell").isin(probe_cells)).drop("_cell")
    return brute_force_topk(cand, query, k, id_col, vec_col)


def cosine_near_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
) -> DataFrame:
    """Embedding near-dup pairs: LSH-bucket equi-join (same signature) →
    exact cosine ≥ threshold. At 8 planes, vectors above ~0.95 cosine share
    a bucket with high probability; raise recall with fewer planes."""
    first = vectors.select(vec_col).first()
    dim = len(first[vec_col])
    sigged = vectors.select(
        F.col(id_col), F.col(vec_col), lsh_signature(vec_col, dim, num_planes).alias("_sig")
    )
    a = sigged.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"), "_sig")
    b = sigged.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"), "_sig")
    return (
        a.join(b, "_sig")
        .filter(F.col("a") < F.col("b"))
        .withColumn("cosine", F.round(cosine_sim(F.col("va").cast("array<double>"), F.col("vb").cast("array<double>")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )
