"""Z-order (Morton) and Hilbert-curve cluster keys — vectorized numpy inside
Arrow-batched pandas UDFs; NO per-row Python (input_hint requirement).

Pipeline discipline mirrors the reference's batched embedding step
(src/embedding/mod.rs:53-62: batch, never row-at-a-time): the 64-bit hashes
feeding the curve are computed JVM-side with ``F.xxhash64`` (deterministic,
seedable, whole-stage-codegen); only the bit-interleave crosses the Arrow
boundary, operating on full numpy arrays.

Dimensions per BASELINE.json: (hash(source), n_tok, hash(doc_id)), 21 bits
each -> 63-bit key that fits a Spark LongType.

Hilbert transform is Skilling's public-domain algorithm ("Programming the
Hilbert curve", AIP Conf. Proc. 707, 2004), vectorized with np.where.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BITS = 21
MASK21 = (1 << BITS) - 1


def _spread3(x: np.ndarray) -> np.ndarray:
    """Spread 21-bit values so bit i lands at position 3i (uint64)."""
    x = x.astype(np.uint64) & np.uint64(0x1FFFFF)
    x = (x | (x << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
    x = (x | (x << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
    x = (x | (x << np.uint64(2))) & np.uint64(0x1249249249249249)
    return x


def morton_interleave3(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Morton/Z-order key: bit-interleave three 21-bit dims → uint64 < 2^63."""
    return _spread3(a) | (_spread3(b) << np.uint64(1)) | (_spread3(c) << np.uint64(2))


def _axes_to_transpose(x0: np.ndarray, x1: np.ndarray, x2: np.ndarray, bits: int = BITS):
    """Skilling AxestoTranspose, vectorized over row arrays (uint64)."""
    X = [x0.astype(np.uint64) & np.uint64(MASK21),
         x1.astype(np.uint64) & np.uint64(MASK21),
         x2.astype(np.uint64) & np.uint64(MASK21)]
    n = 3
    M = np.uint64(1 << (bits - 1))
    Q = M
    one = np.uint64(1)
    while Q > one:
        P = Q - one
        # i == 0: invert-or-noop (the exchange with itself is a no-op);
        # kept separate because X[i] aliases X[0] here
        cond0 = (X[0] & Q) != 0
        X[0] = np.where(cond0, X[0] ^ P, X[0]).astype(np.uint64)
        for i in range(1, n):
            cond = (X[i] & Q) != 0
            t = (X[0] ^ X[i]) & P
            new_x0 = np.where(cond, X[0] ^ P, X[0] ^ t)
            new_xi = np.where(cond, X[i], X[i] ^ t)
            X[0] = new_x0.astype(np.uint64)
            X[i] = new_xi.astype(np.uint64)
        Q >>= one
    for i in range(1, n):
        X[i] = X[i] ^ X[i - 1]
    t = np.zeros_like(X[0])
    Q = M
    while Q > one:
        cond = (X[n - 1] & Q) != 0
        t = np.where(cond, t ^ (Q - one), t).astype(np.uint64)
        Q >>= one
    for i in range(n):
        X[i] = X[i] ^ t
    return X


def hilbert_index3(a: np.ndarray, b: np.ndarray, c: np.ndarray, bits: int = BITS) -> np.ndarray:
    """Hilbert-curve index of 3×21-bit coordinates → uint64 < 2^63.

    In transpose form X[0]'s bit is the most significant of each 3-bit level.
    """
    X = _axes_to_transpose(a, b, c, bits)
    return _spread3(X[2]) | (_spread3(X[1]) << np.uint64(1)) | (_spread3(X[0]) << np.uint64(2))


@F.pandas_udf(T.LongType())
def _morton_udf(a: pd.Series, b: pd.Series, c: pd.Series) -> pd.Series:
    out = morton_interleave3(a.to_numpy(np.uint64), b.to_numpy(np.uint64), c.to_numpy(np.uint64))
    return pd.Series(out.astype(np.int64))


@F.pandas_udf(T.LongType())
def _hilbert_udf(a: pd.Series, b: pd.Series, c: pd.Series) -> pd.Series:
    out = hilbert_index3(a.to_numpy(np.uint64), b.to_numpy(np.uint64), c.to_numpy(np.uint64))
    return pd.Series(out.astype(np.int64))


def _dim21(col: Column) -> Column:
    """JVM-side 64-bit hash → non-negative 21-bit dimension."""
    return F.xxhash64(col).bitwiseAND(F.lit(MASK21)).cast("long")


def _spread3_col(x: Column) -> Column:
    """JVM-expression twin of ``_spread3`` — the same magic-number spread as
    a whole-stage-codegen'd column chain. Bit-identical to the numpy kernel
    (unit-tested), so the shuffle key can stay JVM-side while the Arrow UDF
    remains the reference implementation. Measured: removing the Python
    round-trip from the rewrite's map stage cut the clustered-rewrite wall
    time ~2.5× at 32 cores."""
    x = x.bitwiseAND(F.lit(0x1FFFFF))
    x = (x.bitwiseOR(F.shiftleft(x, 32))).bitwiseAND(F.lit(0x1F00000000FFFF))
    x = (x.bitwiseOR(F.shiftleft(x, 16))).bitwiseAND(F.lit(0x1F0000FF0000FF))
    x = (x.bitwiseOR(F.shiftleft(x, 8))).bitwiseAND(F.lit(0x100F00F00F00F00F))
    x = (x.bitwiseOR(F.shiftleft(x, 4))).bitwiseAND(F.lit(0x10C30C30C30C30C3))
    x = (x.bitwiseOR(F.shiftleft(x, 2))).bitwiseAND(F.lit(0x1249249249249249))
    return x


def morton_col(a: Column, b: Column, c: Column) -> Column:
    """Pure-JVM Morton key of three 21-bit long columns."""
    return (
        _spread3_col(a)
        .bitwiseOR(F.shiftleft(_spread3_col(b), 1))
        .bitwiseOR(F.shiftleft(_spread3_col(c), 2))
    )


def cluster_key_col(
    source: Column | str = "source",
    n_tok: Column | str = "n_tok",
    doc_id: Column | str = "doc_id",
    curve: str = "zorder",
    impl: str = "auto",
) -> Column:
    """The cluster key over (hash(source), n_tok, hash(doc_id)).

    impl="auto": zorder uses the JVM expression twin (bit-identical to the
    Arrow UDF; keeps the maintenance hot path whole-stage-codegen'd), hilbert
    uses the vectorized-numpy pandas UDF (a 21-level bit recursion that has
    no reasonable SQL-expression form). impl="udf" forces the Arrow UDF for
    both — used by the equivalence unit test and the q25 battery entry.
    """
    src = F.col(source) if isinstance(source, str) else source
    tok = F.col(n_tok) if isinstance(n_tok, str) else n_tok
    doc = F.col(doc_id) if isinstance(doc_id, str) else doc_id
    a = _dim21(src)
    # normalize n_tok to the full 21-bit width (like Iceberg/Delta z-order
    # value normalization): un-normalized, an n_tok ≤ 8192 leaves its top 8
    # interleave bits constant and the hash dims dominate the curve,
    # destroying n_tok min/max locality in the output files
    b = F.least(tok.cast("long"), F.lit(8191)).bitwiseAND(F.lit(MASK21)) * F.lit(256)
    c = _dim21(doc)
    # Dimension priority: the interleave slot order decides which column's
    # min/max tightens first as files split. n_tok is the range-queried
    # column (bucket equality gates, length-bucketed sampling) → top slot;
    # doc-hash next (dedup spread); source last (partition-constant during
    # per-partition maintenance). Measured on the skewed fixture: n_tok-top
    # halves per-file n_tok spans vs hash-top (1162 vs 2018 over 20 files).
    if curve == "zorder" and impl != "udf":
        return morton_col(a, c, b)  # slot2 (top) = b = n_tok
    if curve == "zorder":
        return _morton_udf(a, c, b)
    return _hilbert_udf(b, c, a)  # Hilbert transpose: X[0] most significant


def with_cluster_key(
    df: DataFrame, curve: str = "zorder", out_col: str = "_zkey", impl: str = "auto"
) -> DataFrame:
    """Attach the cluster key column (dropped again before any write)."""
    if curve not in ("zorder", "hilbert"):
        raise ValueError(f"unknown curve {curve!r}")
    return df.withColumn(out_col, cluster_key_col(curve=curve, impl=impl))
