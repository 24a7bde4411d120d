"""Watermarked event-time windows with late-data semantics (SURVEY §3.3's
streaming-aggregation arm; the reference's watcher pipeline has no event-time
notion — this is the Spark-native upgrade the task addendum calls for).

``windowed_counts``: tumbling event-time window counts in APPEND mode with a
watermark — a window's row is emitted exactly once, when the watermark passes
the window end and its state is evicted. Events arriving after their
window's state was evicted are DROPPED (a late row whose window is still
live in the same micro-batch merges into the final emission — measured Spark
semantics, pinned by the test). Bounded state is the point: without the
watermark the window state grows forever at 100-TB/day ingest.

Late-vs-dropped semantics are pinned by tests/test_streaming_windowed.py with
a two-micro-batch file source: batch 2 carries one event older than the
watermark (dropped) and one on-time event (counted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    stream: DataFrame,
    window: str = "5 minutes",
    late_threshold: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """event-time tumbling-window counts per key, watermarked.

    Append output mode compatible: the aggregation carries the watermark, so
    each (window, key) row finalizes once. State per (window, key) only —
    O(active windows), not O(events).
    """
    return (
        stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, late_threshold)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            key_col,
            "n",
        )
    )


def run_windowed_counts_over_files(
    spark,
    landing_dir: str,
    schema,
    checkpoint_dir: str,
    query_name: str,
    window: str = "5 minutes",
    late_threshold: str = "10 minutes",
    max_files_per_trigger: int = 1,
):
    """Drive ``windowed_counts`` over a parquet landing directory, one file
    per micro-batch (so watermark advancement between batches is observable),
    append mode into a memory sink. Returns the started StreamingQuery."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("latestFirst", "false")
        .parquet(landing_dir)
    )
    agg = windowed_counts(stream, window=window, late_threshold=late_threshold)
    return (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
