"""Ingest-maintained BM25 term-stats index (lakehouse/fts.py).

Gate: the indexed scoring path must be BIT-identical to the 2-scan
`bm25_scores` whenever the index has absorbed the whole corpus — same IEEE
expression, stats folded as literals — and its plan must contain exactly
one scan of the documents table (reference: persistent lazy FTS index,
src/store/table_ops.rs:409-468).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from octocode_spark.lakehouse.fts import (
    N_DOCS_KEY,
    SUM_DL_KEY,
    bm25_scores_indexed,
    create_term_stats,
    ingest_term_stats,
    term_stats_delta,
)
from octocode_spark.operators.hybrid import bm25_scores

SF = "/root/testdata/sf0.001"
TERMS = ["spark", "join", "window"]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _ingested(spark, docs, tmp_path, batches):
    t = create_term_stats(str(tmp_path / "terms"))
    for b in batches:
        ingest_term_stats(spark, t, b)
    return t


def test_indexed_bm25_equals_two_scan_form(spark, docs, tmp_path):
    halves = [
        docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == i) for i in (0, 1)
    ]
    t = _ingested(spark, docs, tmp_path, halves)
    got = {
        r["id"]: r["bm25"]
        for r in bm25_scores_indexed(spark, docs, t, TERMS).collect()
    }
    want = {r["id"]: r["bm25"] for r in bm25_scores(docs, TERMS).collect()}
    assert got == want  # exact float equality: identical IEEE expression


def test_additive_ingest_matches_full_rebuild(spark, docs, tmp_path):
    thirds = [
        docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(3)) == i) for i in (0, 1, 2)
    ]
    t = _ingested(spark, docs, tmp_path, thirds)
    got = {r["term"]: r["df"] for r in t.read(spark).collect()}
    want = {r["term"]: r["df"] for r in term_stats_delta(docs).collect()}
    assert got == want
    assert got[N_DOCS_KEY] == docs.count()
    assert got[SUM_DL_KEY] == sum(
        r[0] for r in docs.select(
            F.size(F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), 0))
        ).collect()
    )


def test_indexed_plan_scans_corpus_once(spark, docs, tmp_path):
    t = _ingested(spark, docs, tmp_path, [docs])
    plan = (
        bm25_scores_indexed(spark, docs, t, TERMS)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan parquet") == 1  # corpus scanned once, stats are literals
    assert "documents.parquet" in plan


def test_empty_index_raises(spark, docs, tmp_path):
    t = create_term_stats(str(tmp_path / "empty"))
    with pytest.raises(ValueError, match="no corpus rows"):
        bm25_scores_indexed(spark, docs, t, TERMS)


def test_remove_term_stats_inverts_ingest(spark, docs, tmp_path):
    """remove(ingest(B)) must restore the exact pre-B index: df values equal,
    and terms unique to B leave the table entirely (MERGE delete arm)."""
    from octocode_spark.lakehouse.fts import remove_term_stats

    a = docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0)
    b = docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 1)
    t = create_term_stats(str(tmp_path / "terms_rm"))
    ingest_term_stats(spark, t, a)
    before = {r["term"]: r["df"] for r in t.read(spark).collect()}
    ingest_term_stats(spark, t, b)
    remove_term_stats(spark, t, b)
    after = {r["term"]: r["df"] for r in t.read(spark).collect()}
    assert after == before
    # and scoring over corpus A matches a fresh 2-scan computation
    got = {r["id"]: r["bm25"] for r in bm25_scores_indexed(spark, a, t, TERMS).collect()}
    want = {r["id"]: r["bm25"] for r in bm25_scores(a, TERMS).collect()}
    assert got == want


def test_duplicate_reserved_rows_detected(spark, docs, tmp_path):
    """The concurrent-bootstrap corruption (two insert-only ingests both
    landing) must be detected loudly by the next fold, not silently served."""
    from octocode_spark.lakehouse.fts import N_DOCS_KEY

    t = create_term_stats(str(tmp_path / "terms_dup"))
    ingest_term_stats(spark, t, docs.limit(5))
    # simulate the second bootstrap writer: raw append of a duplicate
    # reserved row behind the MERGE's back
    dup = spark.createDataFrame([(N_DOCS_KEY, 5)], "term: string, df: long")
    t.append(dup)
    with pytest.raises(RuntimeError, match="corrupted"):
        ingest_term_stats(spark, t, docs.limit(3))


def test_hybrid_search_with_index_identical_to_plain(spark, docs, tmp_path):
    """hybrid_search(term_stats=...) fuses identically to the 2-scan form —
    the indexed keyword arm is bit-identical, so RRF output cannot move."""
    from octocode_spark.operators.hybrid import hybrid_search

    vecs = spark.read.parquet(f"{SF}/embeddings.parquet")
    t = create_term_stats(str(tmp_path / "terms_hybrid"))
    ingest_term_stats(spark, t, docs)
    plain = hybrid_search(docs, vecs, TERMS, query_vec_id=0, k=15).collect()
    indexed = hybrid_search(docs, vecs, TERMS, query_vec_id=0, k=15, term_stats=t).collect()
    assert [r.asDict() for r in indexed] == [r.asDict() for r in plain]
