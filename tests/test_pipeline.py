"""End-to-end curation pipeline: every stage must fire on a crafted corpus,
the committed table must be readable and correctly packed, and two runs of
the same input must commit byte-identical corpora."""

from __future__ import annotations

from pyspark.sql import functions as F

from octocode_spark.functions.digest import row_hash_col
from octocode_spark.lakehouse.table import LakeTable
from octocode_spark.pipeline import curate

GOOD = (
    "This is a clean and useful training sentence with many healthy words in it. "
    * 3
).strip()


def _corpus(spark):
    near_a = (
        "The maintenance engine compacts the small files and rewrites the "
        "manifests while keeping every snapshot readable for all of the users."
    )
    near_b = near_a.replace("all of the users", "most of the users")
    rows = [
        # exact dups (clean text) -> one survivor
        (1, GOOD, "web"),
        (2, GOOD, "web"),
        # near-dups -> fuzzy dedup keeps the min id
        (3, near_a, "web"),
        (4, near_b, "web"),
        # boilerplate-only -> dropped at cleaning
        (5, "lorem ipsum dolor sit amet filler line here.", "web"),
        (6, "{ nothing but a code blob }", "web"),
        # contaminated: contains the benchmark sentence verbatim
        (7, "Here is padding before the secret benchmark sentence that "
            "nobody should ever train on at all. " + GOOD, "web"),
        # clean doc in a second source stream (fully distinct text)
        (8, "A completely different paragraph about shuffle partitions and "
            "broadcast joins fills this record with plenty of readable prose "
            "so the quality filter is satisfied with it entirely.", "books"),
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string, source: string")


def test_curate_end_to_end(spark, tmp_path):
    docs = _corpus(spark)
    bench = spark.createDataFrame(
        [("the secret benchmark sentence that nobody should ever train on at all.",)],
        "text: string",
    )
    stats = curate(
        spark, docs, str(tmp_path / "corpus"), benchmark=bench,
        lsh_threshold=0.5, pack_cap=128,
        term_stats_root=str(tmp_path / "terms"),
    )
    assert stats.n_raw == 8
    assert stats.n_after_clean == 6          # 5 and 6 dropped by cleaning
    assert stats.n_after_exact == 5          # 1/2 collapse
    assert stats.n_after_fuzzy == 4          # 3/4 collapse to 3
    assert stats.n_after_decontaminate == 3  # 7 dropped (8-gram overlap)
    assert stats.snapshot_id is not None

    t = LakeTable.load(str(tmp_path / "corpus"))
    out = t.read(spark)
    assert {r["doc_id"] for r in out.select("doc_id").collect()} == {1, 3, 8}
    assert {r["source"] for r in out.collect()} == {"web", "books"}
    # every pack respects the cap (or is a single oversized doc)
    for r in out.groupBy("source", "pack_id").agg(
        F.sum("n_tok").alias("tot"), F.count("*").alias("n")
    ).collect():
        assert r["tot"] <= 128 or r["n"] == 1
    # the term-stats index absorbed exactly the committed corpus
    from octocode_spark.lakehouse.fts import bm25_scores_indexed
    from octocode_spark.operators.hybrid import bm25_scores

    idx = LakeTable.load(str(tmp_path / "terms"))
    got = {r["id"]: r["bm25"] for r in bm25_scores_indexed(
        spark, out, idx, ["training", "sentence"]).collect()}
    want = {r["id"]: r["bm25"] for r in bm25_scores(out, ["training", "sentence"]).collect()}
    assert got == want


def test_curate_is_deterministic(spark, tmp_path):
    docs = _corpus(spark)
    h = []
    for tag in ("a", "b"):
        curate(spark, docs, str(tmp_path / tag), lsh_threshold=0.5, pack_cap=128)
        out = LakeTable.load(str(tmp_path / tag)).read(spark)
        row = out.select(
            F.sha2(F.concat_ws("|", "doc_id", "source", "text", "n_tok", "pack_id"), 256).alias("h")
        ).agg(F.sort_array(F.collect_list("h")).alias("hs")).collect()[0]
        h.append(tuple(row["hs"]))
    assert h[0] == h[1]
