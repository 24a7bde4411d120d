"""Ingest-maintained BM25 term statistics — the reference's persistent lazy
FTS index (src/store/table_ops.rs:409-468, src/store/mod.rs:744-813)
re-expressed as a tiny LakeTable instead of a Tantivy index.

At 10^12 docs the corpus-stats aggregate inside `bm25_scores` (N, avgdl,
per-term df) cannot be recomputed per query — it is a full corpus scan. The
scoring expression only ever needs len(query_terms)+2 numbers, so the index
is a (term, df) table plus two reserved rows for N and Σdl, maintained
ADDITIVELY at ingest:

- `term_stats_delta(new_docs)` — one aggregate over the ingested batch
  (explode distinct terms → count; map-side combinable, one shuffle).
- `ingest_term_stats(...)` — folds the delta into the stats table with the
  standard MERGE (key=term). merge_into's file pruning keeps the rewrite
  proportional to touched vocabulary, and its CAS commit gives the same
  atomicity as any other table write.
- `bm25_scores_indexed(...)` — reads the ≤ len(terms)+2 needed rows
  (manifest min/max on `term` skips non-matching files), folds them into
  the scoring expression as literals, and scores with ONE scan of `docs` —
  the exact same IEEE expression as the 2-scan `bm25_scores`, so results
  are bit-identical for equal stats.

Reserved keys start with '#', which the tokenizer ([a-z0-9]+ runs) can
never emit, so they cannot collide with a real term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from octocode_spark.lakehouse.table import LakeTable
from octocode_spark.operators.hybrid import (
    BM25_B,
    BM25_K1,
    TOKEN_PATTERN,
    _bm25_total,
    tokenized_base,
)

N_DOCS_KEY = "#docs"   # df column holds N (corpus document count)
SUM_DL_KEY = "#sumdl"  # df column holds Σ doc length (for avgdl = Σdl / N)

TERM_STATS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("df", T.LongType(), False),
    ]
)


def create_term_stats(root: str) -> LakeTable:
    """An empty term-stats LakeTable with min/max stats on `term` so point
    lookups become manifest-level file skipping."""
    return LakeTable.create(root, TERM_STATS_SCHEMA, stat_cols=["term"])


def term_stats_delta(
    new_docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(term, df) contribution of one ingested batch: per-term distinct-doc
    counts plus the two reserved rows (#docs → batch size, #sumdl → Σ dl).
    One explode + one map-side-combinable aggregate."""
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), 0)
    per_doc = new_docs.select(toks.alias("_toks"))
    term_df = (
        per_doc.select(F.explode(F.array_distinct("_toks")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    corpus = per_doc.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.coalesce(F.sum(F.size("_toks")), F.lit(0)).cast("long").alias("_sumdl"),
    ).select(
        F.explode(
            F.array(
                F.struct(F.lit(N_DOCS_KEY).alias("term"), F.col("_n").alias("df")),
                F.struct(F.lit(SUM_DL_KEY).alias("term"), F.col("_sumdl").alias("df")),
            )
        ).alias("s")
    ).select("s.term", "s.df")
    return term_df.unionByName(corpus)


def _apply_term_delta(
    spark: SparkSession,
    stats: LakeTable,
    docs: DataFrame,
    text_col: str,
    sign: int,
) -> None:
    """Fold a ± batch delta into the stats table.

    MERGE replaces matched rows wholesale, so the source carries the SUMMED
    df: delta left-joined against current values of exactly the touched
    terms. The join's left side is the batch vocabulary (small); the stats
    table side is read through a manifest [min,max]-term range prune (for a
    topically-narrow batch only overlapping files are opened; a term-
    bucketed layout would tighten it further) and file-pruned again by
    merge_into on the same keys. Negative folds (document deletion) mark
    rows reaching df ≤ 0 with the MERGE delete flag, so vanished terms
    leave the index entirely.

    CONCURRENCY: single-writer per index, like any maintenance job. The
    MERGE commit is CAS-protected against lost updates of REPLACED files,
    but two simultaneous bootstrap ingests into an empty table both take
    the insert-only path and both land — creating duplicate rows. That
    corruption is detected loudly here after every fold (a reserved-row
    duplicate count, one tiny stat-pruned read)."""
    from octocode_spark.lakehouse.merge import merge_into

    # cache: the delta aggregate feeds both the bounds action and the MERGE
    # source materialization — without it the tokenize+agg runs twice
    delta = term_stats_delta(docs, text_col).cache()
    try:
        # manifest range prune over the REAL vocabulary only: the reserved
        # '#docs'/'#sumdl' keys sort before every real term, so including
        # them pins the lower bound to '#docs' and the prune only ever cuts
        # files entirely ABOVE the batch's max term. Files holding the
        # reserved rows are kept by explicit point checks instead.
        bounds = (
            delta.filter(~F.col("term").isin(N_DOCS_KEY, SUM_DL_KEY))
            .agg(F.min("term"), F.max("term"))
            .first()
        )
        lo, hi = bounds[0], bounds[1]

        def _overlaps(f):
            if _stat_contains(f, N_DOCS_KEY) or _stat_contains(f, SUM_DL_KEY):
                return True  # reserved rows always join
            rng = f.stats.get("term")
            if not rng:
                return True
            return lo is not None and rng[0] <= hi and lo <= rng[1]

        current = stats.read(spark, stat_filter=_overlaps).withColumnRenamed("df", "_old")
        summed = delta.join(current, "term", "left").select(
            "term",
            (F.coalesce(F.col("_old"), F.lit(0)) + F.lit(sign) * F.col("df")).alias("df"),
        )
        if sign < 0:
            summed = summed.withColumn("deleted", F.col("df") <= 0)
        merge_into(spark, stats, summed, key="term")
    finally:
        delta.unpersist()
    n_docs_rows = (
        stats.refresh().read(spark, stat_filter=lambda f: _stat_contains(f, N_DOCS_KEY))
        .filter(F.col("term") == N_DOCS_KEY)
        .count()
    )
    if n_docs_rows > 1:
        raise RuntimeError(
            f"term-stats index corrupted: {n_docs_rows} '{N_DOCS_KEY}' rows "
            "(concurrent bootstrap ingests?) — rebuild the index"
        )


def _stat_contains(f, key: str) -> bool:
    rng = f.stats.get("term")
    return not rng or (rng[0] <= key <= rng[1])


def ingest_term_stats(
    spark: SparkSession,
    stats: LakeTable,
    new_docs: DataFrame,
    text_col: str = "text",
) -> None:
    """Fold one ingested batch into the stats table (additive upsert)."""
    _apply_term_delta(spark, stats, new_docs, text_col, +1)


def remove_term_stats(
    spark: SparkSession,
    stats: LakeTable,
    removed_docs: DataFrame,
    text_col: str = "text",
) -> None:
    """Subtract a deleted batch from the stats table — the other half of
    ingest maintenance: after remove(ingest(B)) the index is exactly the
    pre-B index (terms whose df hits 0 are deleted via the MERGE delete
    arm). Pass the SAME rows that were deleted from the corpus."""
    _apply_term_delta(spark, stats, removed_docs, text_col, -1)


def read_query_stats(
    spark: SparkSession, stats: LakeTable, terms: list[str]
) -> tuple[float, float, list[float]]:
    """(N, avgdl, df-per-term) for a query — reads ≤ len(terms)+2 rows.

    File skipping is manifest-level: term min/max stats prune files whose
    range can't contain any requested key (the same P2 machinery as data
    tables), so the read cost is per-matching-file, not per-table."""
    keys = sorted({t.lower() for t in terms} | {N_DOCS_KEY, SUM_DL_KEY})

    def _overlaps(f):
        rng = f.stats.get("term")
        if not rng:
            return True
        lo, hi = rng
        return any(lo <= k <= hi for k in keys)

    rows = {
        r["term"]: r["df"]
        for r in stats.read(spark, stat_filter=_overlaps)
        .filter(F.col("term").isin(keys))
        .collect()
    }
    n = float(rows.get(N_DOCS_KEY, 0))
    if n <= 0:
        raise ValueError("term-stats table has no corpus rows; ingest first")
    avgdl = float(rows.get(SUM_DL_KEY, 0)) / n
    dfs = [float(rows.get(t.lower(), 0)) for t in terms]
    return n, avgdl, dfs


def bm25_scores_indexed(
    spark: SparkSession,
    docs: DataFrame,
    stats: LakeTable,
    terms: list[str],
    k1: float = BM25_K1,
    b: float = BM25_B,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, bm25) with corpus stats from the ingest-maintained index: ONE
    scan of `docs`, stats folded in as literals. Bit-identical to
    `bm25_scores` whenever the index matches the corpus (pinned by pytest)."""
    if not terms:
        raise ValueError("bm25_scores_indexed requires at least one query term")
    terms = [t.lower() for t in terms]
    n, avgdl, dfs = read_query_stats(spark, stats, terms)
    base = tokenized_base(docs, terms, text_col, id_col)
    total, any_hit = _bm25_total(len(terms), n, avgdl, dfs, k1, b)
    return base.filter(any_hit).select("id", total.alias("bm25"))
