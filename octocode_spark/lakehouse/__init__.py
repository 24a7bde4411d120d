"""Iceberg-semantics table format, from scratch in Python + parquet.

Layout (HadoopCatalog-style — the commit point is an O_EXCL metadata-file
create, exactly the "durability point IS the commit" contract the reference
states at src/store/table_ops.rs:106-114):

    <table_root>/
      data/source=<v>/<uuid>.parquet          # self-contained files (partition
                                              #   cols kept IN the file)
      metadata/
        v<N>.metadata.json                    # full table metadata, version N
        mf-<uuid>.json                        # manifest: data files + stats
        version-hint.text                     # advisory pointer to latest N

Commits are optimistic: build metadata for version N+1, create the file with
O_CREAT|O_EXCL; a loser of the race reloads, revalidates (replaced files must
still be live), and retries — replacing the reference's PID-file write lock
(src/lock.rs:12-103) with lock-free optimistic concurrency. Readers pin a
snapshot's manifest list, so reads are serializable-snapshot-isolated for
free; expired files stay on disk until expire_snapshots + remove_orphan_files.
"""

from octocode_spark.lakehouse.table import LakeTable, CommitConflict  # noqa: F401
from octocode_spark.lakehouse.ledger import Ledger  # noqa: F401
