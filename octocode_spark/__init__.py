"""octocode_spark — a from-scratch PySpark-native lakehouse table-maintenance
engine with the data-processing capabilities of Muvon/octocode.

The reference (/root/reference, Rust) maintains Arrow-columnar LanceDB tables:
batch ingest, hash-keyed differential upsert, fragment compaction + version
pruning, commit-marker checkpoints for resumable incremental runs, and
snapshot-coherent overlay reads (SURVEY.md). This package re-expresses those
behaviors Spark-first over an Iceberg-semantics table format implemented in
pure Python + parquet:

- ``lakehouse``  — snapshot log, manifests with per-file min/max stats,
  atomic optimistic commits, time travel, snapshot expiry + orphan GC
  (analog of reference ``src/store/mod.rs:666-721`` optimize_tables).
- ``maintenance`` — bin-packing compaction to 512MB targets, Z-order/Hilbert
  clustered rewrite, manifest rewrite, MERGE INTO upserts
  (analog of ``src/indexer/differential_processor.rs:132-201``).
- ``ledger``     — per-partition checkpoint ledger for kill/resume
  (analog of ``src/store/metadata.rs:58-117,184-234``).
- ``functions`` / ``operators`` — Z-order & Hilbert keys (vectorized numpy),
  dedup (exact/MinHash-LSH/SimHash/n-gram Jaccard/embedding-cosine),
  similarity search, text analysis, RRF fusion
  (analog of ``src/store/weighted_rrf.rs``).
"""

__version__ = "0.1.0"

from octocode_spark.session import get_spark  # noqa: F401
