"""Per-partition checkpoint ledger (FIXTURES.md F3; north rule).

One JSON file per (op, partition) under ``<ledger_root>/<op>/``, written
atomically via temp+rename ONLY AFTER the data snapshot commits — the write
ordering the reference enforces in persist_and_store_metadata
(src/indexer/mod.rs:494-574: "if flush fails, do NOT store metadata").
A killed job therefore leaves `pending`/absent rows exactly for the
partitions whose snapshots did not commit, and a rerun replays only those
(contract from src/indexer/mod.rs:888-894). Each `done` row records the
snapshot_id it committed, so resume can validate lineage against the table's
snapshot log before skipping (the reference's branch-manifest coherence
check, src/indexer/search.rs:720-746).

At sandbox scale this is a directory of tiny JSON files; on a real cluster
the same schema lives in its own lakehouse table — the protocol (data commit
first, ledger second, idempotent replay) is what matters.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import asdict, dataclass

STATUS_PENDING = "pending"
STATUS_DONE = "done"


@dataclass
class LedgerRow:
    partition: str
    op: str  # compact | zorder | merge | expire | manifest
    files_rewritten: int
    bytes: int
    rows: int
    commit_id: int | None  # snapshot_id the op committed
    status: str
    updated_at: int  # epoch seconds


class Ledger:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, op: str, partition: str) -> str:
        safe = partition.replace("/", "__").replace("=", "-")
        d = os.path.join(self.root, op)
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"{safe}.json")

    def write(self, row: LedgerRow) -> None:
        path = self._path(row.op, row.partition)
        tmp = f"{path}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(asdict(row), fh)
        os.replace(tmp, path)

    def mark_pending(self, op: str, partition: str) -> None:
        self.write(LedgerRow(partition, op, 0, 0, 0, None, STATUS_PENDING, int(time.time())))

    def mark_done(
        self, op: str, partition: str, files_rewritten: int, bytes_: int, rows: int, commit_id: int
    ) -> None:
        self.write(
            LedgerRow(partition, op, files_rewritten, bytes_, rows, commit_id, STATUS_DONE, int(time.time()))
        )

    def get(self, op: str, partition: str) -> LedgerRow | None:
        path = self._path(op, partition)
        if not os.path.exists(path):
            return None
        with open(path) as fh:
            return LedgerRow(**json.load(fh))

    def all_rows(self, op: str | None = None) -> list[LedgerRow]:
        rows: list[LedgerRow] = []
        if not os.path.isdir(self.root):
            return rows
        ops = [op] if op else sorted(os.listdir(self.root))
        for o in ops:
            d = os.path.join(self.root, o)
            if not os.path.isdir(d):
                continue
            for name in sorted(os.listdir(d)):
                if name.endswith(".json"):
                    with open(os.path.join(d, name)) as fh:
                        rows.append(LedgerRow(**json.load(fh)))
        return rows

    def done_partitions(self, op: str, valid_snapshot_ids: set[int] | None = None) -> set[str]:
        """Partitions already finished. If ``valid_snapshot_ids`` is given,
        a done row whose commit_id is not in the table's snapshot log is
        treated as INVALID (lineage drift) and will be replayed."""
        done = set()
        for row in self.all_rows(op):
            if row.status != STATUS_DONE:
                continue
            if valid_snapshot_ids is not None and row.commit_id not in valid_snapshot_ids:
                continue
            done.add(row.partition)
        return done

    def clear(self, op: str | None = None) -> None:
        import shutil

        if op is None:
            shutil.rmtree(self.root, ignore_errors=True)
            os.makedirs(self.root, exist_ok=True)
        else:
            shutil.rmtree(os.path.join(self.root, op), ignore_errors=True)
