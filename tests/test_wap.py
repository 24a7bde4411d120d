"""Write-Audit-Publish staging branches (C6 full form): audit readers see
the branch, main readers don't, publish is an atomic fast-forward that
refuses when main moved past the fork point."""

from __future__ import annotations

import pytest

from octocode_spark.datagen import sequences
from octocode_spark.functions.digest import table_digest
from octocode_spark.lakehouse import CommitConflict, LakeTable
from tests.conftest import make_sequences_table


def _rows_ge(spark, n_lo, n_hi):
    return sequences(spark, n_hi, max_tok_cap=64).filter(
        f"cast(substring(doc_id, -12, 12) as long) >= {n_lo}"
    )


def test_wap_stage_audit_publish(spark, tmp_table_dir):
    t = make_sequences_table(spark, tmp_table_dir, n_rows=400, small_files=4, max_tok_cap=64)
    main_digest = table_digest(t.read(spark))

    t.create_branch("audit")
    staged = _rows_ge(spark, 400, 450)  # 50 fresh rows
    snap = t.append(staged, branch="audit")
    assert snap.parent_id is not None

    # main is untouched; the branch sees base + staged
    assert table_digest(t.read(spark)) == main_digest
    branch_df = t.read(spark, branch="audit")
    assert branch_df.count() == 450
    assert LakeTable.load(t.root).meta.current_snapshot_id != snap.snapshot_id

    # audit passes -> publish fast-forwards main atomically
    published = t.publish_branch("audit")
    assert published == snap.snapshot_id
    assert t.meta.current_snapshot_id == snap.snapshot_id
    assert t.read(spark).count() == 450
    assert t.branches() == {}
    # a second writer handle sees the published state
    assert LakeTable.load(t.root).read(spark).count() == 450


def test_wap_publish_refuses_when_main_moved(spark, tmp_table_dir):
    t = make_sequences_table(spark, tmp_table_dir, n_rows=300, small_files=4, max_tok_cap=64)
    t.create_branch("audit")
    t.append(_rows_ge(spark, 300, 330), branch="audit")
    # concurrent writer advances MAIN past the fork point
    t.append(_rows_ge(spark, 500, 520))
    with pytest.raises(CommitConflict, match="main moved"):
        t.publish_branch("audit")
    # branch still live for re-staging; main unaffected by staged rows
    assert t.read(spark).count() == 320
    assert t.read(spark, branch="audit").count() == 330
    t.drop_branch("audit")
    assert t.branches() == {}


def test_wap_branch_heads_survive_expiry(spark, tmp_table_dir):
    t = make_sequences_table(spark, tmp_table_dir, n_rows=200, small_files=2, max_tok_cap=64)
    t.create_branch("audit")
    t.append(_rows_ge(spark, 200, 230), branch="audit")
    head = t.branch_head("audit")
    # churn main so old snapshots expire
    t.append(_rows_ge(spark, 600, 620))
    t.append(_rows_ge(spark, 700, 720))
    import time as _time
    t.expire_snapshots(older_than_ms=int(_time.time() * 1000) + 60_000, retain_last=1)
    # the branch head snapshot is protected and fully readable
    ids = {s.snapshot_id for s in t.meta.snapshots}
    assert head in ids
    assert t.read(spark, branch="audit").count() == 230
    # publish refuses (main moved) but the data was never lost
    with pytest.raises(CommitConflict):
        t.publish_branch("audit")


def test_wap_multiple_branch_commits_chain(spark, tmp_table_dir):
    t = make_sequences_table(spark, tmp_table_dir, n_rows=100, small_files=2, max_tok_cap=64)
    t.create_branch("audit")
    s1 = t.append(_rows_ge(spark, 100, 120), branch="audit")
    s2 = t.append(_rows_ge(spark, 120, 140), branch="audit")
    assert s2.parent_id == s1.snapshot_id  # branch lineage chains
    assert t.read(spark, branch="audit").count() == 140
    assert t.read(spark).count() == 100
    t.publish_branch("audit")
    assert t.read(spark).count() == 140


def test_wap_merge_on_branch_then_publish(spark, tmp_table_dir):
    """Full Write-Audit-Publish for a bulk MERGE: the upsert commits to the
    staging branch, main readers see the pre-merge table until publish."""
    from pyspark.sql import functions as F

    from octocode_spark.functions.digest import table_digest
    from octocode_spark.lakehouse.merge import merge_into

    t = make_sequences_table(spark, tmp_table_dir, n_rows=600, small_files=4, max_tok_cap=64)
    pre_digest = table_digest(t.read(spark))
    base = sequences(spark, 600, max_tok_cap=64)

    from octocode_spark.datagen import sequence_updates

    updates = sequence_updates(spark, 600, 150, max_tok_cap=64)
    expected = (
        base.join(updates.select("doc_id"), "doc_id", "left_anti")
        .unionByName(updates.filter(~F.col("deleted")).drop("deleted"))
    )

    t.create_branch("audit")
    stats = merge_into(spark, t, updates, branch="audit")
    assert stats.files_rewritten > 0

    # main unchanged; branch carries the merged state
    assert table_digest(t.read(spark)) == pre_digest
    assert table_digest(t.read(spark, branch="audit")) == table_digest(expected)

    t.publish_branch("audit")
    assert table_digest(t.read(spark)) == table_digest(expected)


def test_time_travel_and_rollback_ignore_branch_snapshots(spark, tmp_table_dir):
    """snapshot_as_of never serves unpublished branch commits; rollback_to
    refuses to point main at one (publish_branch is the only promotion)."""
    import time as _time

    t = make_sequences_table(spark, tmp_table_dir, n_rows=200, small_files=2, max_tok_cap=64)
    main_head = t.meta.current_snapshot_id
    t.create_branch("audit")
    staged = t.append(_rows_ge(spark, 200, 230), branch="audit")

    # the staged snapshot is the NEWEST by timestamp, but timestamp travel
    # must resolve to main's head
    now = int(_time.time() * 1000) + 1000
    assert t.snapshot_as_of(now) == main_head
    with pytest.raises(ValueError, match="publish_branch"):
        t.rollback_to(staged.snapshot_id)

    # rollback past a later main commit, then time-travel still sees only
    # main ancestry (the abandoned head is invisible to as-of readers)
    s2 = t.append(_rows_ge(spark, 300, 320))
    t.rollback_to(main_head)
    assert t.snapshot_as_of(now) == main_head
    # roll-forward to the abandoned descendant is allowed
    t.rollback_to(s2.snapshot_id)
    assert t.meta.current_snapshot_id == s2.snapshot_id
