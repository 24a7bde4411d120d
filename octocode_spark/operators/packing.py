"""Training-sequence packing: bin documents into fixed token-budget packs.

The pretraining data-prep step after filtering/dedup: examples are
concatenated into context-window-sized sequences so no budget is wasted on
padding. The packing itself is inherently sequential WITHIN a stream (the
pack a doc lands in depends on every doc before it), so the Spark shape is:

- parallelism across STREAMS (here: `source`; at 100 TB, (source, shard)
  with shard = a deterministic doc_id bucket — thousands of independent
  streams, each a modest pandas group);
- greedy first-fit IN DETERMINISTIC ORDER (doc_id) inside each stream via
  ``applyInPandas`` — a per-group cumulative scan, Arrow-batched, no
  row-at-a-time Python UDF;
- engine-portable semantics: the same greedy rule is expressible as a
  linear recursive CTE, which is exactly what the q54 DuckDB oracle runs.

Greedy rule: start a new pack when adding the next doc would exceed ``cap``;
a doc longer than cap gets a pack of its own.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def token_weight(text: Column) -> Column:
    """Token count used as the packing weight — the SAME tokenizer constant
    as the BM25 doc length (imported, not copy-pasted, so they cannot
    drift), keeping weights consistent across operators and engines."""
    from octocode_spark.operators.hybrid import TOKEN_PATTERN

    return F.size(F.regexp_extract_all(F.lower(text), F.lit(TOKEN_PATTERN), 0)).cast("long")


def pack_greedy(
    docs: DataFrame,
    cap: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    stream_col: str = "source",
    shards: int = 1,
) -> DataFrame:
    """(stream, doc_id, n_tok, pack_id): greedy first-fit packing per
    stream, docs taken in ascending ``id_col`` order. ``shards`` > 1 splits
    each stream into that many deterministic doc_id-hash sub-streams — the
    scale knob that bounds the per-group pandas state regardless of corpus
    size (pack_id stays unique per (stream, shard))."""
    weighted = docs.select(
        F.col(stream_col).alias("stream"),
        F.col(id_col).alias("doc_id"),
        token_weight(F.col(text_col)).alias("n_tok"),
    )
    group_cols = ["stream"]
    if shards > 1:
        weighted = weighted.withColumn(
            "shard", F.pmod(F.xxhash64("doc_id"), F.lit(shards)).cast("int")
        )
        group_cols.append("shard")
    out_schema = T.StructType(
        [
            T.StructField("stream", T.StringType()),
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_tok", T.LongType()),
            T.StructField("pack_id", T.LongType()),
        ]
    )

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id")
        packs, acc, cur = [], 0, -1
        for w in pdf["n_tok"]:
            if cur < 0 or acc + w > cap:
                cur += 1
                acc = int(w)
            else:
                acc += int(w)
            packs.append(cur)
        if "shard" in pdf.columns:
            # shard-qualify so pack ids stay unique per STREAM: local pack k
            # of shard s becomes k·shards + s (stable, collision-free)
            s = int(pdf["shard"].iloc[0])
            packs = [k * shards + s for k in packs]
        return pd.DataFrame(
            {
                "stream": pdf["stream"],
                "doc_id": pdf["doc_id"],
                "n_tok": pdf["n_tok"],
                "pack_id": packs,
            }
        )

    return weighted.groupBy(*group_cols).applyInPandas(pack, out_schema)


def pack_stats(packed: DataFrame, cap: int) -> DataFrame:
    """Per-stream packing efficiency: packs, docs, fill = Σtok / (packs·cap)
    — the waste metric a packing strategy is judged by."""
    return (
        packed.groupBy("stream")
        .agg(
            F.countDistinct("pack_id").alias("n_packs"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("total_tok"),
        )
        .withColumn("fill", F.round(F.col("total_tok") / (F.col("n_packs") * F.lit(cap)), 6))
    )
