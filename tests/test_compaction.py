"""Compaction + clustering: the north rule's equality gates.

(a) bitwise token-array equality of post-maintenance full scans (via the
    order-insensitive table digest — FIXTURES.md F4 golden_scan_digest),
(b) identical per-(source, n_tok-bucket) group counts,
(c) manifest min/max stats present and usable for file skipping,
(d) planner idempotence: a second maintenance pass plans zero work.
"""

from __future__ import annotations

from octocode_spark.functions.digest import group_counts, table_digest
from octocode_spark.lakehouse import Ledger
from octocode_spark.lakehouse.maintenance import (
    full_maintenance,
    needs_recluster,
    plan_compaction,
    rewrite_partitions,
)
from tests.conftest import make_sequences_table


def _group_count_map(df):
    return {(r["source"], r["n_tok_bucket"]): r["cnt"] for r in group_counts(df).collect()}


def test_compaction_preserves_data_bitwise(spark, tmp_table_dir):
    t = make_sequences_table(spark, tmp_table_dir, n_rows=3000, small_files=24)
    pre_digest = table_digest(t.read(spark))
    pre_groups = _group_count_map(t.read(spark))
    files_before = len(t.files())

    plan = plan_compaction(t)
    assert plan.partitions, "skewed fixture must produce compactable partitions"
    res = rewrite_partitions(spark, t, plan, cluster_by="zorder")

    assert len(t.files()) < files_before
    assert table_digest(t.read(spark)) == pre_digest  # (a)
    assert _group_count_map(t.read(spark)) == pre_groups  # (b)
    assert res.files_out <= res.files_in


def test_manifest_stats_written_after_cluster_rewrite(spark, tmp_table_dir):
    t = make_sequences_table(spark, tmp_table_dir, n_rows=3000, small_files=24)
    rewrite_partitions(spark, t, plan_compaction(t), cluster_by="zorder")
    for f in t.files():
        assert "n_tok" in f.stats and "doc_id" in f.stats  # (c)
        lo, hi = f.stats["n_tok"]
        assert lo <= hi
        assert f.records > 0 and f.bytes > 0


def test_planner_is_idempotent(spark, tmp_table_dir):
    t = make_sequences_table(spark, tmp_table_dir, n_rows=2000, small_files=16)
    rewrite_partitions(spark, t, plan_compaction(t), cluster_by=None)
    again = plan_compaction(t)
    assert not again.partitions  # (d): already at target layout


def test_full_maintenance_end_to_end(spark, tmp_table_dir, tmp_path):
    t = make_sequences_table(spark, tmp_table_dir, n_rows=2500, small_files=20)
    pre = table_digest(t.read(spark))
    ledger = Ledger(str(tmp_path / "ledger"))
    import time as _time
    out = full_maintenance(
        spark, t, ledger=ledger, cluster_by="hilbert", retain_last=1,
        expire_older_than_ms=int(_time.time() * 1000) + 60_000,  # explicit: reap now
    )
    assert out["rewrite"].partitions_done
    assert out["expired_files_removed"] > 0  # expire reaped its own files
    assert out["orphans_removed"] == 0  # nothing inside the writer grace window
    assert table_digest(t.read(spark)) == pre
    # ledger has one done row per rewritten partition, each with a live commit
    snap_ids = {s.snapshot_id for s in t.meta.snapshots}
    rows = ledger.all_rows("compact")
    assert {r.partition for r in rows if r.status == "done"} == set(out["rewrite"].partitions_done)


def test_needs_recluster_drift_rule():
    assert needs_recluster(10, 1000, 16, 1000)   # +60% files
    assert needs_recluster(10, 1000, 10, 1600)   # +60% rows
    assert not needs_recluster(10, 1000, 11, 1100)
    assert needs_recluster(0, 0, 1, 10)          # empty before ⇒ always
