"""Weighted Reciprocal-Rank Fusion — the reference's rerank core
(src/store/weighted_rrf.rs:24-165: score = w / (k + rank), k = 60) as a
window-rank + full-outer aggregate, the J5/A2/A3 composition from SURVEY.md.

Spark-first shape: each ranked source list is a DataFrame (id, native_score);
rank-within-list = row_number over a window (SURVEY §2.7), fusion = unionByName
+ groupBy(id).agg(sum(contrib)) with min_by tie-break representative — all
JVM-side, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_K = 60  # reference default, src/config.rs:204-231


def rank_in_list(df: DataFrame, order_col: str, ascending: bool = True,
                 partition_cols: list[str] | None = None) -> DataFrame:
    """0-based rank of each row within its (optionally partitioned) list —
    the implicit rank the reference reads off list position
    (src/store/weighted_rrf.rs:83-105)."""
    order = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    w = Window.partitionBy(*(partition_cols or [])).orderBy(order, F.col("id"))
    return df.withColumn("rank", F.row_number().over(w) - F.lit(1))


def weighted_rrf(
    lists: list[tuple[DataFrame, float, str, bool]],
    k: int = RRF_K,
    limit: int | None = None,
) -> DataFrame:
    """Fuse ranked lists: each entry (df, weight, order_col, ascending).

    Every df needs an `id` column. Returns (id, rrf_score, sources) ordered
    by fused score desc with deterministic id tie-break (the reference's
    determinism rule, src/indexer/search.rs:1717-1736).
    """
    contribs = []
    for i, (df, weight, order_col, ascending) in enumerate(lists):
        ranked = rank_in_list(df.select("id", order_col), order_col, ascending)
        contribs.append(
            ranked.select(
                "id",
                (F.lit(weight) / (F.lit(k) + F.col("rank") + F.lit(1))).alias("contrib"),
                F.lit(i).alias("src"),
            )
        )
    unioned = contribs[0]
    for c in contribs[1:]:
        unioned = unioned.unionByName(c)
    fused = (
        unioned.groupBy("id")
        .agg(
            F.sum("contrib").alias("rrf_score"),
            F.count(F.lit(1)).alias("sources"),
        )
        .orderBy(F.col("rrf_score").desc(), F.col("id").asc())
    )
    return fused.limit(limit) if limit else fused
