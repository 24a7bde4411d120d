"""Changelog-driven table replication: follow a source LakeTable's snapshot
log and apply its row-level deltas to a destination table — the reference's
watcher → incremental-reindex loop (src/mcp/watcher.rs:33-142, the git-diff
incremental source S3) composed with the CDC scan.

Semantics: each source commit's delta applies as its OWN destination commit,
in ancestry order — a key deleted and re-appended across two source commits
lands delete-then-insert, and a row inserted then deleted nets to absent,
exactly mirroring source state. Deletes apply as merge-on-read positional
deletes keyed on ``key`` (no destination file rewrites); inserts append.

Cursor discipline: the caller persists the returned snapshot id (e.g. in a
Ledger row) AFTER the destination commits land and passes it back next
round. Re-running a round is idempotent for deletes (the rows are already
gone) but NOT for inserts (append has no key guard) — persist the cursor
with the same write-ordering rule as the maintenance ledger (C3: data
commit first, cursor after), and on a crash between the two, re-sync with
MERGE instead (merge_into is the idempotent replay path).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from octocode_spark.lakehouse.table import LakeTable


def replicate_changelog(
    spark: SparkSession,
    src: LakeTable,
    dst: LakeTable,
    from_snapshot_id: int,
    key: str,
    to_snapshot_id: int | None = None,
) -> int:
    """Apply src's changes after ``from_snapshot_id`` (up to
    ``to_snapshot_id``, default current) to dst. Returns the new cursor
    (the last applied source snapshot id, or ``from_snapshot_id`` when
    nothing changed)."""
    src.refresh()
    snaps = list(reversed(src._main_ancestry()))
    idx = {s.snapshot_id: i for i, s in enumerate(snaps)}
    if from_snapshot_id not in idx:
        raise KeyError(f"unknown source snapshot {from_snapshot_id}")
    hi = idx[to_snapshot_id] if to_snapshot_id is not None else len(snaps) - 1
    cursor = from_snapshot_id
    for s in snaps[idx[from_snapshot_id] + 1 : hi + 1]:
        delta = src.changelog_read(spark, from_snapshot_id=cursor, to_snapshot_id=s.snapshot_id)
        # deletes FIRST: within one source commit the delete rows are the
        # PRE-existing copies (a same-commit insert+delete pair cannot occur;
        # appends and MoR deletes are distinct operations), so removing by
        # key before appending reproduces the source's final state
        del_keys = [
            r[key]
            for r in delta.filter(F.col("_change_type") == "delete").select(key).collect()
        ]
        if del_keys:
            dst.delete_where(spark, F.col(key).isin(del_keys), mode="mor")
        ins = (
            delta.filter(F.col("_change_type") == "insert")
            .drop("_change_type", "_snapshot_id")
        )
        if not ins.isEmpty():
            dst.append(ins)
        cursor = s.snapshot_id
    return cursor
