"""Custom stateful streaming operators via applyInPandasWithState.

streaming_dedup: exactly-once-per-key emission across micro-batches — the
streaming form of the reference's content-hash dedup (J1 differential:
already-seen keys are skipped, src/indexer/differential_processor.rs:132-201).
State per key is a single seen-flag; at 10^12 keys the state store shards by
the groupBy hash across executors (RocksDB-backed on a real cluster).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T


def streaming_dedup(stream: DataFrame, key: str = "doc_id") -> DataFrame:
    """Emit only the FIRST row ever seen for each key, across all
    micro-batches of the stream's lifetime (checkpoint-durable state)."""
    out_schema = stream.schema
    state_schema = T.StructType([T.StructField("seen", T.IntegerType(), False)])

    def dedup(
        key_tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return
        for pdf in pdfs:
            if len(pdf):
                state.update((1,))
                yield pdf.head(1)
                return

    return stream.groupBy(key).applyInPandasWithState(
        dedup, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
