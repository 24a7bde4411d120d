"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode/feature-extract kernels are STUBBED (image/audio libs are not in
this container): ``decode_stub=True`` produces deterministic fake features
derived from the payload bytes, so the Spark-side contract — schema,
partitioning, UDF signature, Arrow batch shape — is fully real and tested;
swapping in PIL/torchaudio later changes ONE function body.

Reference analog: the embedding provider boundary (src/embedding/mod.rs:
141-193) — an expensive vectorized columnar stage behind a stable signature.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),        # image | audio | video
    T.StructField("payload", T.BinaryType(), False),     # opaque encoded bytes
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
    ]), True),
])

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("features", T.ArrayType(T.FloatType()), False),
])


def synthetic_media(spark: SparkSession, n: int, parallelism: int | None = None) -> DataFrame:
    """Deterministic fake media corpus: payload = repeated sha256 stream of
    the id; metadata consistent per kind."""
    base = spark.range(0, n, 1, parallelism or 8)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("id"), 3) + 1).cast("int"),
    )
    payload = F.to_binary(
        F.repeat(F.sha2(F.concat(F.lit("media-"), F.col("id")), 256), 8), F.lit("hex")
    )
    return base.select(
        F.concat(F.lit("m-"), F.lpad(F.col("id").cast("string"), 8, "0")).alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.lit(64).alias("width"), F.lit(64).alias("height"),
            F.lit(16000).alias("sample_rate"), F.lit(30).alias("n_frames"),
            F.lit("fake/v1").alias("codec"),
        ).alias("meta"),
    )


def _decode_batch(payloads: pd.Series, kinds: pd.Series, decode_stub: bool) -> np.ndarray:
    """The ONE function a real deployment replaces with PIL/ffmpeg/torchaudio.
    Stub: 16 deterministic floats from a sha256 of the payload bytes."""
    if not decode_stub:
        raise NotImplementedError(
            "real decode needs image/audio libs not present in this container; "
            "run with decode_stub=True or install decoders"
        )
    out = np.empty((len(payloads), FEATURE_DIM), dtype=np.float32)
    for i, (raw, kind) in enumerate(zip(payloads, kinds)):  # bounded by Arrow batch
        digest = hashlib.sha256(bytes(raw) + kind.encode()).digest()
        out[i] = np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32) / 65535.0
    return out


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, Arrow batches out.
    Repartition upstream by media_id for even decode load (payload sizes can
    skew exactly like hot `source` keys)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = _decode_batch(pdf["payload"], pdf["kind"], decode_stub)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "features": list(feats),
            })

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plan (pure SQL): one row per sampled frame index —
    the explode that precedes a real per-frame decode."""
    frames = F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_idx"))
    )
