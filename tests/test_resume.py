"""Kill/resume from the per-partition checkpoint ledger (north rule; F3).

Contract from the reference: partial state retained, markers not advanced,
rerun resumes exactly the unfinished work (src/indexer/mod.rs:888-894 +
persist_and_store_metadata ordering :494-574).
"""

from __future__ import annotations

import pytest

from octocode_spark.functions.digest import table_digest
from octocode_spark.lakehouse import Ledger
from octocode_spark.lakehouse.maintenance import plan_compaction, rewrite_partitions
from tests.conftest import make_sequences_table


def test_kill_then_resume_replays_only_unfinished(spark, tmp_table_dir, tmp_path):
    t = make_sequences_table(spark, tmp_table_dir, n_rows=3000, small_files=24)
    pre = table_digest(t.read(spark))
    ledger = Ledger(str(tmp_path / "ledger"))
    plan = plan_compaction(t)
    n_parts = len(plan.partitions)
    assert n_parts >= 4
    k = n_parts // 2

    with pytest.raises(RuntimeError, match="simulated kill"):
        rewrite_partitions(spark, t, plan, ledger=ledger, cluster_by="zorder", fail_after=k)

    # the table is still fully consistent mid-run: every commit was atomic
    assert table_digest(t.read(spark)) == pre
    done_rows = [r for r in ledger.all_rows("compact") if r.status == "done"]
    assert len(done_rows) == k

    # resume: replan against current metadata, rerun with the same ledger
    t.refresh()
    plan2 = plan_compaction(t)
    res2 = rewrite_partitions(spark, t, plan2, ledger=ledger, cluster_by="zorder")
    # only the n-k unfinished partitions were rewritten
    done_keys = {r.partition for r in done_rows}
    assert set(res2.partitions_done).isdisjoint(done_keys)
    assert len(res2.partitions_done) == n_parts - k
    assert table_digest(t.read(spark)) == pre
    # ledger now fully done
    assert len(ledger.done_partitions("compact")) == n_parts


def test_resume_revalidates_lineage(spark, tmp_table_dir, tmp_path):
    """A done ledger row whose commit_id is NOT in the snapshot log (lineage
    drift — e.g. the table was replaced) must be replayed, mirroring the
    reference's branch-coherence refusal (src/indexer/search.rs:720-746)."""
    t = make_sequences_table(spark, tmp_table_dir, n_rows=1500, small_files=12)
    ledger = Ledger(str(tmp_path / "ledger"))
    plan = plan_compaction(t)
    key = plan.partitions[0].key
    # forge a done row with a bogus snapshot id
    ledger.mark_done("compact", key, 1, 1, 1, commit_id=123456789)
    res = rewrite_partitions(spark, t, plan, ledger=ledger)
    assert key in res.partitions_done  # replayed despite 'done' marker


def test_ledger_write_ordering(spark, tmp_table_dir, tmp_path):
    """Ledger rows must reference snapshots that exist in the table log —
    evidence that data commit precedes ledger write (C3)."""
    t = make_sequences_table(spark, tmp_table_dir, n_rows=1500, small_files=12)
    ledger = Ledger(str(tmp_path / "ledger"))
    rewrite_partitions(spark, t, plan_compaction(t), ledger=ledger)
    snap_ids = {s.snapshot_id for s in t.meta.snapshots}
    for row in ledger.all_rows("compact"):
        if row.status == "done":
            assert row.commit_id in snap_ids
