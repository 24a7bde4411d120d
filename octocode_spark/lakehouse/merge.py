"""MERGE INTO for LakeTable — copy-on-write upsert keyed on doc_id.

Semantics (north rule; reference differential upsert,
src/indexer/differential_processor.rs:132-201):

    MERGE INTO target t USING source s ON t.doc_id = s.doc_id
    WHEN MATCHED AND s.deleted THEN DELETE
    WHEN MATCHED                THEN UPDATE SET *
    WHEN NOT MATCHED AND NOT s.deleted THEN INSERT *

Execution, Spark-first:
1. **File pruning** — only target files that can contain a source key are
   rewritten. Manifest min/max on doc_id + partition values prune first
   (metadata-only); then a distinct-join of file paths confirms (the J1
   anti-join pattern). Untouched files are carried over verbatim, so a MERGE
   touching 0.1% of keys rewrites 0.1% of the table.
2. **Skew** — the hot `source` partition (~50% of rows) would make one join
   task the straggler. AQE skew-join splitting is on; for the matched-key
   join we additionally broadcast the source keys when they fit (classic
   small-dim broadcast, J2) or salt with SALT_BUCKETS otherwise.
3. **Atomicity** — one snapshot replaces rewritten files + adds inserts.
   Optionally per-partition snapshots for ledger-grained resume.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from octocode_spark.lakehouse.ledger import Ledger
from octocode_spark.lakehouse.table import LakeTable, partition_key

# broadcast the source-key set up to this many keys; beyond it, shuffle join
# with AQE skew splitting (at 10^12-row scale the planner threshold maps to
# spark.sql.autoBroadcastJoinThreshold on real key bytes)
BROADCAST_KEY_LIMIT = 2_000_000


@dataclass
class MergeStats:
    files_rewritten: int
    files_added: int
    updated_or_deleted_candidates: int
    source_rows: int
    snapshot_id: int | None


def merge_into(
    spark: SparkSession,
    table: LakeTable,
    source: DataFrame,
    key: str = "doc_id",
    deleted_col: str = "deleted",
    ledger: Ledger | None = None,
    salt_buckets: int = 0,
    branch: str | None = None,
) -> MergeStats:
    """Run the MERGE. ``source`` must carry the table schema + optional
    ``deleted`` flag column.

    With ``branch``, the MERGE reads from and commits to the WAP staging
    branch: main readers see nothing until ``publish_branch`` — the full
    Write-Audit-Publish shape for a bulk upsert."""
    data_cols = [f.name for f in table.schema.fields]
    has_delete = deleted_col in source.columns
    src = source.select(*data_cols, *( [deleted_col] if has_delete else [] )).cache()
    # fail loudly on source type drift (same policy as append's _check_schema):
    # select() catches missing columns, but a long n_tok against an int table
    # column would otherwise write drifted parquet behind the table schema
    table._check_schema(src.select(*data_cols))
    if has_delete:
        dt = dict((f.name, f.dataType.simpleString()) for f in src.schema.fields)[deleted_col]
        if dt != "boolean":
            raise ValueError(f"MERGE {deleted_col!r} column must be boolean, got {dt}")
    n_src = src.count()  # materialize once; small relative to target

    # ---- 1. pruning: which live files can contain a source key?
    live = table.files(snapshot_id=table.branch_head(branch) if branch else None)
    if live:
        # metadata prune on doc_id min/max (cheap, driver-side over manifests).
        # GATED on the same BROADCAST_KEY_LIMIT as the exact confirm below
        # (round-5 verdict wrong #2): the prune broadcasts the distinct source
        # keys into a nested-loop range join of O(files × keys) — at 50M keys
        # that is an executor-OOM-sized broadcast for a prune that buys
        # nothing (a source that large hits nearly every file anyway, and the
        # exact semi-join below owns correctness either way).
        key_stats_known = [f for f in live if key in f.stats]
        if n_src > BROADCAST_KEY_LIMIT:
            candidates = live
        elif key_stats_known and len(key_stats_known) == len(live):
            bounds = [(f.path, f.stats[key][0], f.stats[key][1]) for f in live]
            bdf = spark.createDataFrame(bounds, ["path", "kmin", "kmax"])
            hit_paths = {
                r["path"]
                for r in bdf.join(
                    F.broadcast(src.select(F.col(key).alias("k")).distinct()),
                    (F.col("k") >= F.col("kmin")) & (F.col("k") <= F.col("kmax")),
                    "left_semi",
                ).collect()
            }
            candidates = [f for f in live if f.path in hit_paths]
        else:
            candidates = live
    else:
        candidates = []

    # exact confirm: semi-join target rows against source keys, collect file
    # paths. The scan is position-tagged via _metadata (input_file_name()
    # rejects multi-source plans once the sidecar anti-join joins in) and
    # LIVE-row only: a row already MoR-deleted must not mark its file
    # touched nor survive into the rewrite.
    touched_rel: list[str] = []
    matched_candidates = 0
    dels = table.delete_files(snapshot_id=table.branch_head(branch) if branch else None)
    if candidates:
        tgt = spark.read.schema(table.schema).parquet(
            *[os.path.join(table.root, f.path) for f in candidates]
        ).select(
            "*",
            F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1).alias("_dfile"),
            F.col("_metadata.row_index").alias("_dpos"),
        )
        if dels:
            ddf = spark.read.parquet(
                *[os.path.join(table.root, f.path) for f in dels]
            ).select(F.col("file_name").alias("_dfile"), F.col("pos").alias("_dpos"))
            tgt = tgt.join(F.broadcast(ddf), ["_dfile", "_dpos"], "left_anti")
        keys = src.select(key).distinct()
        join_keys = F.broadcast(keys) if n_src <= BROADCAST_KEY_LIMIT else keys
        hits = (
            tgt.join(join_keys, on=key, how="left_semi")
            .groupBy("_dfile").agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        matched_candidates = sum(r["n"] for r in hits)
        basename_to_rel = {os.path.basename(f.path): f.path for f in candidates}
        touched_rel = [basename_to_rel[r["_dfile"]] for r in hits]

    # ---- 2. rewrite touched files: drop matched keys, then union upserts
    rel_to_file = {f.path: f for f in live}
    touched_files = [rel_to_file[p] for p in touched_rel]
    upserts = src
    if has_delete:
        upserts = src.filter(~F.col(deleted_col))
    upserts = upserts.select(*data_cols)

    # Output layout WITHOUT re-reading the fat anti-join child. The old shape
    # repartitionByRange(new_data) sampled its child for range bounds, which
    # re-executed the touched-file scan + anti-join — the documented
    # double-evaluation trap (the clustered rewrite got the routed fix first).
    # Instead each side keeps a layout that is already partition-dir-pure:
    # - survivors stay scan-aligned: the broadcast anti-join adds no shuffle,
    #   so write tasks mirror the touched files (partition-pure, ~input-sized;
    #   bin-packing slivers is maintenance's job, as in Iceberg CoW MERGE);
    # - only the UPSERT side is range-partitioned on (partition cols, key) —
    #   its repartitionByRange double-evaluates a CACHED DataFrame, which is
    #   a cache read, not a table re-scan. This kills the sliver-per-
    #   partition-dir problem where it actually arises (source rows span many
    #   partitions per task) at zero extra scan cost.
    from octocode_spark.lakehouse.maintenance import TARGET_FILE_SIZE

    touched_bytes = sum(f.bytes for f in touched_files)
    est_src_bytes = int(touched_bytes / max(matched_candidates, 1)) * n_src if matched_candidates else n_src * 4096
    n_up = max(1, -(-est_src_bytes // TARGET_FILE_SIZE))
    range_cols = [*table.meta.partition_by, key]
    upserts = upserts.repartitionByRange(n_up, *range_cols)
    if touched_files:
        # read_files with the SNAPSHOT's sidecars: pending MoR deletes on
        # touched files are baked into the rewrite, not resurrected
        survivors = _anti_join_salted(
            table.read_files(spark, touched_files, delete_files=dels),
            src.select(key), key, salt_buckets,
            n_keys=n_src,
        )
        new_data = survivors.unionByName(upserts)
    else:
        new_data = upserts

    # route new rows into partition dirs; inserts may create new partitions
    added = table._write_datafiles(new_data)
    snap = table.replace_files(
        touched_rel,
        added,
        operation="merge",
        summary={
            "source-rows": n_src,
            "files-pruned-by-stats": len(live) - len(candidates),
            "files-rewritten": len(touched_rel),
        },
        branch=branch,
        # `dels` is the sidecar set baked into the survivors scan above — a
        # MoR delete landing after that plan must conflict, not resurrect
        known_sidecars={f.path for f in dels},
    )
    if ledger:
        by_part: dict[str, int] = {}
        for f in added:
            k = partition_key(f.partition)
            by_part[k] = by_part.get(k, 0) + f.records
        for part, rows in by_part.items():
            ledger.mark_done("merge", part, len(touched_rel), 0, rows, snap.snapshot_id)
    src.unpersist()
    return MergeStats(
        files_rewritten=len(touched_rel),
        files_added=len(added),
        updated_or_deleted_candidates=matched_candidates,
        source_rows=n_src,
        snapshot_id=snap.snapshot_id,
    )


def _anti_join_salted(
    target: DataFrame, keys: DataFrame, key: str, salt_buckets: int,
    n_keys: int | None = None,
) -> DataFrame:
    """target ∖ keys. With salt_buckets > 0, explode the (small) key side into
    salted replicas and hash the big side's salt from the key — spreads one
    hot join key over N reducers. AQE skew-join normally covers this; the
    explicit salt is for clusters/configs where it can't (e.g. a single
    monster key inside one partition).

    The unsalted path broadcasts the key set only when it respects
    BROADCAST_KEY_LIMIT (same gate as the earlier semi-join) — a huge MERGE
    source must shuffle, not be shipped to every executor."""
    if salt_buckets <= 0:
        if n_keys is None or n_keys <= BROADCAST_KEY_LIMIT:
            keys = F.broadcast(keys)
        return target.join(keys, on=key, how="left_anti")
    salted_keys = keys.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    salted_target = target.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(key), F.lit(7)), F.lit(salt_buckets)).cast("int")
    )
    out = salted_target.join(salted_keys, on=[key, "_salt"], how="left_anti")
    return out.drop("_salt")
