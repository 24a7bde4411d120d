"""End-to-end training-data curation pipeline — the operators composed the
way a pretraining data job actually runs them, from raw documents to a
committed, indexed corpus:

    raw docs
      → C4-style line cleaning            (text.c4_clean)
      → quality / length gate             (text.quality_score, token_weight)
      → exact dedup (keep-best)           (dedup.dedup_keep_best)
      → fuzzy dedup: MinHash-LSH pairs →
        connected components → one rep    (dedup.minhash_lsh_pairs,
                                           duplicate_groups / dedup_fuzzy)
      → benchmark decontamination         (dedup.decontaminate)
      → sequence packing                  (packing.pack_greedy)
      → atomic commit to a LakeTable      (lakehouse.table)
      → BM25 term-stats ingest            (lakehouse.fts)

Every stage is a declarative DataFrame transform (the pack scan is the one
Arrow-batched applyInPandas); the whole flow is ONE lazy plan up to the
table write, so Catalyst prunes columns end-to-end and nothing collects to
the driver. Determinism: all randomness is seeded hashing, so two runs of
the same input commit byte-identical corpora (pinned by test).

Reference analog: the indexing pipeline (watch → parse → dedup by content
hash → embed → commit, src/indexer/mod.rs) — re-targeted at corpus
curation instead of code indexing.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class CurationStats:
    n_raw: int
    n_after_clean: int
    n_after_exact: int
    n_after_fuzzy: int
    n_after_decontaminate: int
    n_packs: int
    snapshot_id: int | None


def curate(
    spark: SparkSession,
    raw_docs: DataFrame,
    table_root: str,
    benchmark: DataFrame | None = None,
    min_quality: float = 0.3,
    min_tokens: int = 5,
    pack_cap: int = 2048,
    lsh_threshold: float = 0.7,
    term_stats_root: str | None = None,
) -> CurationStats:
    """Run the full curation flow over ``raw_docs(doc_id, text, source)``
    and commit the packed corpus to a LakeTable at ``table_root`` with
    schema (doc_id, source, text, n_tok, pack_id). Returns per-stage
    survivor counts (each count is one action; the stage chain itself stays
    lazy between counts)."""
    from octocode_spark.lakehouse.table import LakeTable
    from octocode_spark.operators.dedup import (
        decontaminate,
        dedup_fuzzy,
        dedup_keep_best,
        minhash_lsh_pairs,
    )
    from octocode_spark.operators.packing import pack_greedy, token_weight
    from octocode_spark.operators.text import c4_clean, quality_score

    n_raw = raw_docs.count()

    # 1. line-level clean + quality/length gate
    cleaned = (
        raw_docs.withColumn("text", c4_clean(F.col("text")))
        .filter(F.length("text") > 0)
        .filter(quality_score(F.col("text")) >= min_quality)
        .filter(token_weight(F.col("text")) >= min_tokens)
    )
    n_clean = cleaned.count()

    # 2. exact dedup, keeping the highest-quality representative
    exact = dedup_keep_best(cleaned, quality_score(F.col("text")))
    n_exact = exact.count()

    # 3. fuzzy dedup: LSH candidate pairs → transitive clusters → min-id rep
    pairs = minhash_lsh_pairs(exact, threshold=lsh_threshold)
    fuzzy = dedup_fuzzy(exact, pairs)
    n_fuzzy = fuzzy.count()

    # 4. benchmark decontamination (optional). Truncate lineage here: the
    # chain above (windows + LSH joins + iterative CC) would otherwise
    # re-execute for the pack stage, the commit, and every count below —
    # the survivors are the SMALL end of the funnel, so materializing them
    # once is the cheap side of the persist-vs-rescan trade
    decon = (
        (decontaminate(fuzzy, benchmark, n=8) if benchmark is not None else fuzzy)
        .localCheckpoint(eager=True)
    )
    n_decon = decon.count()

    # 5. pack into fixed token budgets per source stream
    packed = pack_greedy(decon, cap=pack_cap)
    out = (
        decon.select("doc_id", "source", "text")
        .join(packed.select("doc_id", "n_tok", "pack_id"), "doc_id")
    )

    # 6. atomic commit
    final = out.select("doc_id", "source", "text", "n_tok", "pack_id")
    table = LakeTable.create(
        table_root, final.schema, partition_by=["source"],
        stat_cols=["doc_id", "n_tok"],
    )
    snap = table.append(final)
    committed = table.read(spark)  # downstream consumers read the TABLE,
    n_packs = committed.select("source", "pack_id").distinct().count()

    # 7. maintain the BM25 term-stats index at ingest (optional) — fed from
    # the committed files, not a re-run of the curation plan
    if term_stats_root is not None:
        from octocode_spark.lakehouse.fts import create_term_stats, ingest_term_stats

        stats = create_term_stats(term_stats_root)
        ingest_term_stats(spark, stats, committed)

    return CurationStats(
        n_raw=n_raw,
        n_after_clean=n_clean,
        n_after_exact=n_exact,
        n_after_fuzzy=n_fuzzy,
        n_after_decontaminate=n_decon,
        n_packs=n_packs,
        snapshot_id=snap.snapshot_id,
    )
