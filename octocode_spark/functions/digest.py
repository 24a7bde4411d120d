"""Order-insensitive whole-table content digests — the correctness gate.

Bitwise token-array equality over 10^12 rows cannot collect rows to the
driver (SURVEY.md §7 hard part #1). Instead every row is hashed JVM-side
(sha2 over doc_id ‖ n_tok ‖ tokens joined canonically), the 64-bit prefix is
XOR- and SUM-combined across the table, and the (count, xor, sum) triple is
the digest: order-insensitive, insertion/deletion/mutation-sensitive, and
computable as one partial-aggregable scan (map-side combine — no shuffle
beyond one row per partition).

The same digest is expressible in DuckDB SQL, so it doubles as an oracle
query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_hash_col(
    doc_id: str = "doc_id", tokens: str = "tokens", n_tok: str = "n_tok"
) -> Column:
    """Canonical per-row content hash: sha2-256 of 'doc_id|n_tok|t0,t1,...'.

    Two rows collide iff doc_id, n_tok and the token arrays are bitwise
    equal (decimal rendering of int32 is injective).
    """
    return F.sha2(
        F.concat_ws(
            "|",
            F.col(doc_id),
            F.col(n_tok).cast("string"),
            F.array_join(F.col(tokens).cast("array<string>"), ","),
        ),
        256,
    )


def row_hash64_col(**kw) -> Column:
    """64-bit signed prefix of the row hash (for XOR/SUM combining)."""
    return F.conv(F.substring(row_hash_col(**kw), 1, 15), 16, 10).cast("long")


def table_digest(df: DataFrame) -> dict:
    """One-row digest: {rows, xor64, sum20}. Pure map-side aggregation.

    XOR of the 60-bit hash prefix is overflow-free; the SUM leg uses only the
    low 20 bits so 8·10^12 rows still fit a long under ANSI arithmetic while
    catching the XOR's duplicate-pair blind spot.
    """
    h = row_hash64_col()
    row = df.select(
        F.count(F.lit(1)).alias("rows"),
        F.bit_xor(h).alias("xor64"),
        F.sum(h.bitwiseAND(F.lit(0xFFFFF))).alias("sum20"),
    ).collect()[0]
    return {"rows": row["rows"], "xor64": row["xor64"], "sum20": row["sum20"]}


def group_counts(df: DataFrame) -> DataFrame:
    """Per-(source, n_tok-bucket) row counts — the north rule's group gate.
    Bucket = floor(log2(n_tok)), per FIXTURES.md F4."""
    return (
        df.groupBy("source", F.floor(F.log2("n_tok")).cast("int").alias("n_tok_bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
