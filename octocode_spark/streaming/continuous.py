"""Continuous incremental maintenance — Structured Streaming analog of the
reference's debounced file-watcher → reindex loop (src/mcp/watcher.rs:33-142,
SURVEY §3.3).

``readStream`` over a landing directory of parquet drops; every micro-batch
is MERGEd into the LakeTable via ``foreachBatch`` (exactly-once per batch:
the MERGE commits one atomic snapshot; a replayed batch is idempotent because
MERGE is keyed on doc_id). ``Trigger.AvailableNow`` = drain-what-exists-then-
stop, the batch-maintenance trigger; swap for processingTime for a daemon.

The debounce ≙ micro-batch trigger interval; the reference's AtomicBool
reindex guard ≙ the streaming query's single-active-run semantics plus the
commit CAS.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from octocode_spark.lakehouse.merge import merge_into
from octocode_spark.lakehouse.table import LakeTable

UPDATES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("tokens", T.ArrayType(T.IntegerType()), False),
    T.StructField("n_tok", T.IntegerType(), False),
    T.StructField("source", T.StringType(), False),
    T.StructField("deleted", T.BooleanType(), False),
])


def continuous_merge(
    spark: SparkSession,
    table_root: str,
    landing_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start (and with available_now=True, drain) the merge stream.
    Returns the StreamingQuery."""

    def apply_batch(batch_df, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        table = LakeTable.load(table_root)
        merge_into(batch_df.sparkSession, table, batch_df)

    stream = (
        spark.readStream.schema(UPDATES_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(landing_dir)
    )
    writer = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="10 seconds")
    return writer.start()
