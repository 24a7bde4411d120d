"""MERGE INTO semantics: update / insert / delete arms, pruning, salting.

Expected results are computed independently with plain DataFrame set algebra
(anti-join + union), the same oracle construction the reference's
differential tests use (src/indexer/differential_processor.rs:132-201).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from octocode_spark.datagen import sequence_updates, sequences
from octocode_spark.functions.digest import table_digest
from octocode_spark.lakehouse.maintenance import plan_compaction, rewrite_partitions
from octocode_spark.lakehouse.merge import merge_into
from tests.conftest import make_sequences_table

N = 2500


def _expected_after_merge(spark, n_rows, updates):
    base = sequences(spark, n_rows, max_tok_cap=256)
    survivors = base.join(updates.select("doc_id"), "doc_id", "left_anti")
    upserts = updates.filter(~F.col("deleted")).select("doc_id", "tokens", "n_tok", "source")
    return survivors.unionByName(upserts)


def test_merge_update_insert_delete(spark, tmp_table_dir):
    t = make_sequences_table(spark, tmp_table_dir, n_rows=N, small_files=16)
    updates = sequence_updates(spark, N, 600, max_tok_cap=256)
    expected = _expected_after_merge(spark, N, updates)

    # the delete arm must target rows that actually exist pre-merge,
    # otherwise the delete assertions below are vacuous
    pre = sequences(spark, N, max_tok_cap=256).select("doc_id")
    deleted_existing = updates.filter("deleted").join(pre, "doc_id", "left_semi").count()
    assert deleted_existing > 0

    stats = merge_into(spark, t, updates)
    got = t.read(spark)
    assert table_digest(got) == table_digest(expected)
    assert stats.snapshot_id is not None

    # delete arm really removed rows
    deleted_ids = updates.filter("deleted").select("doc_id")
    assert got.join(deleted_ids, "doc_id", "left_semi").count() == 0
    # update arm really mutated tokens
    upd_ids = updates.filter("not deleted").select("doc_id", F.col("n_tok").alias("new_n"))
    mismatch = (
        got.join(upd_ids, "doc_id")
        .filter("n_tok != new_n")
        .count()
    )
    assert mismatch == 0


def test_merge_prunes_untouched_files(spark, tmp_table_dir):
    """A MERGE whose keys live in one partition must not rewrite other
    partitions' files (file-level pruning via doc_id min/max + semi-join)."""
    t = make_sequences_table(spark, tmp_table_dir, n_rows=N, small_files=16)
    # compact first so files have tight doc_id ranges
    rewrite_partitions(spark, t, plan_compaction(t), cluster_by=None)
    before = {f.path for f in t.files()}
    wiki_files = {f.path for f in t.files(partition_filter={"source": "wikipedia"})}

    one = (
        t.read(spark)
        .filter("source = 'wikipedia'")
        .limit(5)
        .withColumn("deleted", F.lit(False))
        .withColumn("tokens", F.slice("tokens", 1, 8))
        .withColumn("n_tok", F.least("n_tok", F.lit(8)).cast("int"))
    )
    stats = merge_into(spark, t, one)
    after = {f.path for f in t.files()}
    untouched_elsewhere = before - wiki_files
    assert untouched_elsewhere <= after  # only wikipedia files were replaced
    assert stats.files_rewritten <= len(wiki_files)


def test_merge_salted_path_matches_unsalted(spark, tmp_table_dir, tmp_path):
    t1 = make_sequences_table(spark, str(tmp_path / "a"), n_rows=1200, small_files=8)
    t2 = make_sequences_table(spark, str(tmp_path / "b"), n_rows=1200, small_files=8)
    updates = sequence_updates(spark, 1200, 300, max_tok_cap=256)
    merge_into(spark, t1, updates, salt_buckets=0)
    merge_into(spark, t2, updates, salt_buckets=8)
    assert table_digest(t1.read(spark)) == table_digest(t2.read(spark))


def test_merge_insert_only_into_empty_partition_space(spark, tmp_table_dir):
    t = make_sequences_table(spark, tmp_table_dir, n_rows=500, small_files=4)
    pre_rows = t.read(spark).count()
    fresh = (
        sequences(spark, 520, max_tok_cap=64)
        .filter("cast(substring(doc_id, -12, 12) as long) >= 500")
        .withColumn("deleted", F.lit(False))
    )
    merge_into(spark, t, fresh)
    assert t.read(spark).count() == pre_rows + 20


def test_merge_rejects_source_type_drift(spark, tmp_table_dir):
    """MERGE must fail loudly when a source column's TYPE drifts from the
    table schema (select() only catches missing columns), and when the
    deleted flag is not boolean — same policy as append's _check_schema."""
    import pytest

    t = make_sequences_table(spark, tmp_table_dir, n_rows=200, small_files=4)
    drifted = sequence_updates(spark, 200, 50, max_tok_cap=256).withColumn(
        "n_tok", F.col("n_tok").cast("long")
    )
    with pytest.raises(ValueError, match="schema drift"):
        merge_into(spark, t, drifted)
    bad_flag = sequence_updates(spark, 200, 50, max_tok_cap=256).withColumn(
        "deleted", F.col("deleted").cast("int")
    )
    with pytest.raises(ValueError, match="must be boolean"):
        merge_into(spark, t, bad_flag)
    # the table is untouched by either rejected merge
    assert t.read(spark).count() == 200


def test_merge_range_partitions_only_the_cached_upserts(spark, tmp_table_dir, monkeypatch):
    """Plan evidence for the double-scan fix: repartitionByRange (whose
    bounds sampling re-executes its child) must be applied exactly once, to
    the CACHED upsert side — never to the fat survivors ∪ upserts union,
    which would re-run the touched-file scan + anti-join."""
    t = make_sequences_table(spark, tmp_table_dir, n_rows=N, small_files=8)
    updates = sequence_updates(spark, N, 400, max_tok_cap=256)
    expected = _expected_after_merge(spark, N, updates)

    # patch the CONCRETE class (pyspark 4: instances are classic.DataFrame,
    # pyspark.sql.DataFrame is the abstract base and never hit at call time)
    DataFrame = type(updates)
    plans = []
    orig = DataFrame.repartitionByRange

    def spy(self, *a, **k):
        plans.append(self._jdf.queryExecution().optimizedPlan().toString())
        return orig(self, *a, **k)

    monkeypatch.setattr(DataFrame, "repartitionByRange", spy)
    merge_into(spark, t, updates)
    assert len(plans) == 1, f"expected exactly one repartitionByRange, saw {len(plans)}"
    assert "InMemoryRelation" in plans[0]  # child is the cached MERGE source
    assert "Join" not in plans[0]  # NOT the anti-join output
    assert table_digest(t.read(spark)) == table_digest(expected)


def test_merge_huge_source_skips_bounds_prune_broadcast(spark, tmp_table_dir, monkeypatch):
    """Sources above BROADCAST_KEY_LIMIT must NOT broadcast their distinct
    keys into the min/max bounds prune (round-5 verdict wrong #2: a 50M-key
    source would OOM executors in an O(files × keys) nested-loop range join
    for a prune that buys nothing). The gate skips the prune entirely —
    every live file becomes a candidate, correctness still owned by the
    exact semi-join. Limit shrunk via monkeypatch so a 600-key source
    counts as 'huge'."""
    from octocode_spark.lakehouse import merge as merge_mod

    t = make_sequences_table(spark, tmp_table_dir, n_rows=N, small_files=8)
    updates = sequence_updates(spark, N, 600, max_tok_cap=256)
    expected = _expected_after_merge(spark, N, updates)

    monkeypatch.setattr(merge_mod, "BROADCAST_KEY_LIMIT", 100)
    DataFrame = type(updates)
    broadcast_children = []
    orig = F.broadcast

    def spy(df):
        broadcast_children.append(df._jdf.queryExecution().analyzed().toString())
        return orig(df)

    monkeypatch.setattr(merge_mod.F, "broadcast", spy)
    merge_into(spark, t, updates)
    # no broadcast call may carry the distinct source keys of the prune
    # (the MoR sidecar anti-join broadcast, if any, is fine — it is bounded
    # by delete-file size, not source size)
    for plan in broadcast_children:
        assert "Distinct" not in plan, f"bounds-prune key broadcast not gated:\n{plan}"
    assert table_digest(t.read(spark)) == table_digest(expected)
