"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

Decode status per modality:
- image — REAL: dependency-free numpy parser for binary PPM (P6), features
  from actually-decoded pixels (channel means/stds, luminance, gradients).
- audio — REAL: numpy RIFF/WAV PCM-16 parser, features from decoded
  samples (RMS, zero-crossings, FFT band energies).
- video — STUB: no ffmpeg in this container; deterministic fake features
  derived from payload bytes, disclosed here and in _decode_batch. The
  Spark-side contract — schema, partitioning, UDF signature, Arrow batch
  shape — is identical for all three, so swapping in a real video decoder
  later changes ONE branch.

``decode_stub=True`` (legacy/test mode) keeps the fake features for every
kind.

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


IMG_W = IMG_H = 8           # synthetic PPM geometry: 8×8 RGB = 192 bytes
WAV_SAMPLES = 64            # synthetic WAV: 64 PCM-16 samples = 128 bytes
WAV_RATE = 16000


def _wav_header(n_data_bytes: int, rate: int = WAV_RATE) -> bytes:
    """Canonical 44-byte RIFF/WAVE header for mono PCM-16."""
    return (
        b"RIFF" + (36 + n_data_bytes).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")            # PCM
        + (1).to_bytes(2, "little")            # mono
        + rate.to_bytes(4, "little")
        + (rate * 2).to_bytes(4, "little")     # byte rate
        + (2).to_bytes(2, "little")            # block align
        + (16).to_bytes(2, "little")           # bits/sample
        + b"data" + n_data_bytes.to_bytes(4, "little")
    )


def synthetic_media(spark: SparkSession, n: int, parallelism: int | None = None) -> DataFrame:
    """Deterministic media corpus with REAL encodings for image and audio:
    image payloads are valid binary PPM (P6, 8×8 RGB), audio payloads are
    valid RIFF/WAV PCM-16 files — pixel/sample bytes come from a repeated
    sha256 stream of the id, so the corpus is reproducible anywhere. Video
    payloads stay an opaque byte stream (no container codec here)."""
    base = spark.range(0, n, 1, parallelism or 8)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("id"), 3) + 1).cast("int"),
    )
    sha = F.sha2(F.concat(F.lit("media-"), F.col("id")), 256)  # 64 hex chars = 32 B
    ppm = F.concat(
        F.lit(f"P6\n{IMG_W} {IMG_H}\n255\n".encode()),
        F.to_binary(F.repeat(sha, 6), F.lit("hex")),           # 192 pixel bytes
    )
    wav = F.concat(
        F.lit(_wav_header(WAV_SAMPLES * 2)),
        F.to_binary(F.repeat(sha, 4), F.lit("hex")),           # 128 sample bytes
    )
    raw = F.to_binary(F.repeat(sha, 8), F.lit("hex"))
    payload = F.when(kind == "image", ppm).when(kind == "audio", wav).otherwise(raw)
    return base.select(
        F.concat(F.lit("m-"), F.lpad(F.col("id").cast("string"), 8, "0")).alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.lit(IMG_W).alias("width"), F.lit(IMG_H).alias("height"),
            F.lit(WAV_RATE).alias("sample_rate"), F.lit(30).alias("n_frames"),
            F.lit("fake/v1").alias("codec"),
        ).alias("meta"),
    )


def decode_ppm(raw: bytes) -> np.ndarray:
    """Binary PPM (P6) → (h, w, 3) uint8 array. Dependency-free: header is
    three whitespace-separated tokens after the magic (comments supported),
    then maxval, then w·h·3 raw bytes."""
    if raw[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(raw) and raw[pos : pos + 1].isspace():
            pos += 1
        if raw[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(raw) and raw[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(raw) and not raw[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(raw[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    n = w * h * 3
    px = np.frombuffer(raw, dtype=np.uint8, count=n, offset=pos)
    return px.reshape(h, w, 3)


def decode_wav_pcm16(raw: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE mono/stereo PCM-16 → (float samples in [-1, 1], rate).
    Walks the chunk list (fmt before data, extra chunks tolerated)."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        size = int.from_bytes(raw[pos + 4 : pos + 8], "little")
        body = raw[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = int.from_bytes(body[0:2], "little")
            bits = int.from_bytes(body[14:16], "little")
            if fmt != 1 or bits != 16:
                raise ValueError(f"only PCM-16 supported (fmt={fmt}, bits={bits})")
            rate = int.from_bytes(body[4:8], "little")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    return x, rate


def _image_features(px: np.ndarray) -> np.ndarray:
    """16 floats from decoded pixels: geometry, per-channel stats,
    luminance, gradient energy — every value a function of REAL samples."""
    h, w, _ = px.shape
    f = np.asarray(px, dtype=np.float64) / 255.0
    lum = 0.2126 * f[:, :, 0] + 0.7152 * f[:, :, 1] + 0.0722 * f[:, :, 2]
    gx = np.abs(np.diff(lum, axis=1)).mean() if w > 1 else 0.0
    gy = np.abs(np.diff(lum, axis=0)).mean() if h > 1 else 0.0
    return np.array(
        [
            w / 256.0, h / 256.0, w / h,
            f[:, :, 0].mean(), f[:, :, 1].mean(), f[:, :, 2].mean(),
            f[:, :, 0].std(), f[:, :, 1].std(), f[:, :, 2].std(),
            lum.mean(), lum.std(), float(f.min()), float(f.max()),
            gx, gy, float(np.median(lum)),
        ],
        dtype=np.float64,
    )


def _audio_features(x: np.ndarray, rate: int) -> np.ndarray:
    """16 floats from decoded samples: level stats, zero-crossing rate, and
    10 normalized FFT band energies."""
    n = max(len(x), 1)
    zcr = float(np.mean(np.signbit(x[:-1]) != np.signbit(x[1:]))) if len(x) > 1 else 0.0
    spec = np.abs(np.fft.rfft(x)) if len(x) else np.zeros(1)
    power = spec[1:] ** 2  # skip DC
    bands = np.zeros(10)
    if power.size:
        for b, chunk in enumerate(np.array_split(power, 10)):
            bands[b] = chunk.sum()
        tot = bands.sum()
        if tot > 0:
            bands = bands / tot
    head = [
        n / (rate or 1),                       # duration seconds
        float(np.sqrt(np.mean(x**2))) if len(x) else 0.0,   # RMS
        float(np.mean(np.abs(x))) if len(x) else 0.0,
        float(np.max(np.abs(x))) if len(x) else 0.0,
        zcr,
        float(np.mean(x)) if len(x) else 0.0,  # DC offset
    ]
    return np.concatenate([np.array(head, dtype=np.float64), bands])


def _stub_features(raw: bytes, kind: str) -> np.ndarray:
    """DISCLOSED STUB (video, and every kind under decode_stub=True): 16
    deterministic floats from a sha256 of the payload — no codec here."""
    digest = hashlib.sha256(bytes(raw) + kind.encode()).digest()
    return np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float64) / 65535.0


def _decode_batch(
    payloads: pd.Series, kinds: pd.Series, decode_stub: bool,
    on_undecodable: str = "raise",
) -> np.ndarray:
    """Per-Arrow-batch decode. Real numpy decoders for image (PPM) and
    audio (WAV PCM-16); video falls back to the disclosed stub (no ffmpeg
    in scope). decode_stub=True forces the stub for every kind.

    ``on_undecodable``: "raise" (default — garbage in a decode pipeline
    should fail loudly, not silently become sha features) or "stub" (mixed
    corpora with codecs outside PPM/WAV-PCM16 keep flowing, undecodable
    rows get the deterministic stub features)."""
    out = np.empty((len(payloads), FEATURE_DIM), dtype=np.float32)
    for i, (raw, kind) in enumerate(zip(payloads, kinds)):  # bounded by Arrow batch
        raw = bytes(raw)
        if decode_stub or kind == "video":
            out[i] = _stub_features(raw, kind)
            continue
        try:
            if kind == "image":
                out[i] = _image_features(decode_ppm(raw))
            elif kind == "audio":
                out[i] = _audio_features(*decode_wav_pcm16(raw))
            else:
                raise ValueError(f"unknown media kind: {kind!r}")
        except ValueError:
            if on_undecodable != "stub":
                raise
            out[i] = _stub_features(raw, kind)
    return out


def extract_features(
    media: DataFrame, decode_stub: bool = False, on_undecodable: str = "raise"
) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, Arrow batches out.
    Default decodes image/audio payloads for REAL (PPM/WAV numpy parsers)
    and fails loudly on unsupported codecs (on_undecodable="stub" opts
    mixed corpora into per-row stub fallback); video uses the disclosed
    stub. Repartition upstream by media_id for even decode load (payload
    sizes can skew exactly like hot `source` keys)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = _decode_batch(pdf["payload"], pdf["kind"], decode_stub, on_undecodable)
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
