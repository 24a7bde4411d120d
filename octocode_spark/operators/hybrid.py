"""Hybrid search: keyword scoring ∥ vector cosine → weighted RRF fusion.

The reference's core read path (SURVEY §3.2: ANN ∥ BM25 → WeightedRRF,
src/store/mod.rs:1194-1370 + src/store/weighted_rrf.rs), re-expressed as two
ranked DataFrames fused by operators/rrf.py. Keyword side here is a simple
term-frequency score (BM25's Lucene machinery is out of scope per SURVEY
non-goals); vector side is exact cosine — swap in operators/ann.lsh_topk for
the ANN path at corpus scale.

Default weights 0.3 keyword-tilted… inverted: reference benchmark found
hybrid_30_70 (vector 0.3 / keyword 0.7) the best local stack
(benchmark/RESULTS.md:17) — that tilt is the default here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from octocode_spark.operators.ann import cosine_sim
from octocode_spark.operators.rrf import weighted_rrf


def keyword_score(text: Column, terms: list[str]) -> Column:
    """Total occurrence count of the query terms (word-boundary matches)."""
    words = F.split(F.lower(F.trim(text)), r"\s+")
    score = None
    for t in terms:
        cnt = F.size(F.filter(words, lambda w: w == t.lower()))
        score = cnt if score is None else score + cnt
    return score.cast("long")


def hybrid_search(
    docs: DataFrame,
    vectors: DataFrame,
    terms: list[str],
    query_vec_id: int,
    k: int = 20,
    vector_weight: float = 0.3,
    keyword_weight: float = 0.7,
    candidates: int = 100,
) -> DataFrame:
    """docs(doc_id, text) ⊕ vectors(vec_id, embedding) → top-k fused ids.

    Two candidate lists of ``candidates`` each (over-fetch, like the
    reference's top_k_candidates=50), fused with w/(60+rank)."""
    kw = (
        docs.select(F.col("doc_id").alias("id"), keyword_score(F.col("text"), terms).alias("kscore"))
        .filter(F.col("kscore") > 0)
        .orderBy(F.col("kscore").desc(), F.col("id").asc())
        .limit(candidates)
    )
    q = vectors.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").cast("array<double>").alias("qv")
    )
    vec = (
        vectors.crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("id"),
            cosine_sim(F.col("embedding").cast("array<double>"), F.col("qv")).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col("id").asc())
        .limit(candidates)
    )
    return weighted_rrf(
        [(kw, keyword_weight, "kscore", False), (vec, vector_weight, "cos", False)],
        limit=k,
    )
