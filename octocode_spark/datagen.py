"""Deterministic synthetic `sequences` corpus (FIXTURES.md F1/F2).

Schema from BASELINE.json input_hint:
    (doc_id string, tokens array<int>, n_tok int, source string)

Everything is generated JVM-side from ``xxhash64`` so the same (seed, n)
produces bitwise-identical tables at any scale and any parallelism — no
driver-side loops, no Python RNG. The `source` distribution is deliberately
Zipf-skewed (common-crawl ~50%) to exercise AQE skew splitting and salting,
mirroring the hot-key concern in SURVEY.md §7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42
VOCAB = 50257  # GPT-2-sized vocab per FIXTURES.md

# Zipf-ish source mix over 100 hash buckets: hot key is ~50% of rows.
_SOURCE_BUCKETS: list[tuple[int, str]] = [
    (50, "common-crawl"),
    (70, "github"),
    (80, "wikipedia"),
    (83, "books"),
    (86, "arxiv"),
    (89, "stackexchange"),
    (92, "news"),
    (94, "forums"),
    (96, "patents"),
    (98, "legal"),
    (99, "reference"),
    (100, "misc"),
]

SOURCES = [s for _, s in _SOURCE_BUCKETS]


def _source_expr(bucket_col):
    expr = None
    for hi, name in _SOURCE_BUCKETS:
        cond = bucket_col < hi
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return expr.otherwise("misc")


def _h(seed_tag: int, *cols):
    """Deterministic 64-bit hash stream keyed by a small tag."""
    return F.xxhash64(F.lit(SEED), F.lit(seed_tag), *cols)


def _uniform(seed_tag: int, id_col, lo, hi):
    """Deterministic uniform integer in [lo, hi] from the id column."""
    return (F.pmod(_h(seed_tag, id_col), F.lit(hi - lo + 1)) + F.lit(lo)).cast("int")


def sequences(
    spark: SparkSession,
    n_rows: int,
    max_tok_cap: int | None = None,
    parallelism: int | None = None,
) -> DataFrame:
    """The F1 `sequences` table.

    n_tok mix: 80% U[16,512], 15% U[513,2048], 5% U[2049,8192]
    (``max_tok_cap`` clamps the top for memory-bounded local runs).
    tokens[pos] = xxhash64(seed, doc_id, pos) % VOCAB — reproducible per row.
    """
    base = spark.range(0, n_rows, 1, parallelism or spark.sparkContext.defaultParallelism)
    bucket = F.pmod(_h(1, F.col("id")), F.lit(100))
    seg = F.pmod(_h(2, F.col("id")), F.lit(100))
    n_tok = (
        F.when(seg < 80, _uniform(3, F.col("id"), 16, 512))
        .when(seg < 95, _uniform(4, F.col("id"), 513, 2048))
        .otherwise(_uniform(5, F.col("id"), 2049, 8192))
    )
    if max_tok_cap:
        n_tok = F.least(n_tok, F.lit(max_tok_cap)).cast("int")
    df = base.select(
        _source_expr(bucket).alias("source"),
        F.col("id"),
        n_tok.alias("n_tok"),
    ).select(
        F.concat_ws("-", "source", F.lpad(F.col("id").cast("string"), 12, "0")).alias("doc_id"),
        F.col("n_tok"),
        F.col("source"),
    )
    tokens = F.transform(
        F.sequence(F.lit(0), F.col("n_tok") - 1),
        lambda pos: F.pmod(_h(6, F.col("doc_id"), pos), F.lit(VOCAB)).cast("int"),
    )
    return df.select("doc_id", tokens.alias("tokens"), "n_tok", "source")


def sequence_updates(
    spark: SparkSession,
    n_existing: int,
    n_updates: int,
    max_tok_cap: int | None = None,
) -> DataFrame:
    """F2 MERGE source: ~60% updates of existing doc_ids (mutated tokens),
    ~30% new doc_ids, ~10% deletions of existing doc_ids (`deleted` flag).
    Skew matches F1 because ids reuse the same bucket hash."""
    from pyspark.sql import Window

    base = spark.range(0, n_updates, 1)
    kind = F.pmod(_h(10, F.col("id")), F.lit(100))
    # updates (kind<60) AND deletes (kind>=90) target existing ids; inserts
    # (60<=kind<90) mint fresh ids beyond n_existing
    target_id = F.when(
        (kind < 60) | (kind >= 90), F.pmod(_h(11, F.col("id")), F.lit(n_existing))
    ).otherwise(F.lit(n_existing) + F.col("id"))
    df = base.select(F.col("id"), target_id.alias("tid"), kind.alias("kind"))
    # one row per target id, DETERMINISTICALLY: an update and a delete can now
    # hash to the same existing id, and their `deleted` flags differ —
    # dropDuplicates would keep an arbitrary one. Min generator id wins.
    w = Window.partitionBy("tid").orderBy("id")
    df = df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn", "id")
    bucket = F.pmod(_h(1, F.col("tid")), F.lit(100))
    seg = F.pmod(_h(12, F.col("tid")), F.lit(100))
    n_tok = (
        F.when(seg < 80, _uniform(13, F.col("tid"), 16, 512))
        .when(seg < 95, _uniform(14, F.col("tid"), 513, 2048))
        .otherwise(_uniform(15, F.col("tid"), 2049, 8192))
    )
    if max_tok_cap:
        n_tok = F.least(n_tok, F.lit(max_tok_cap)).cast("int")
    df = df.select(
        _source_expr(bucket).alias("source"),
        F.col("tid"),
        F.col("kind"),
        n_tok.alias("n_tok"),
    ).select(
        F.concat_ws("-", "source", F.lpad(F.col("tid").cast("string"), 12, "0")).alias("doc_id"),
        F.col("n_tok"),
        F.col("source"),
        (F.col("kind") >= 90).alias("deleted"),
    )
    tokens = F.transform(
        F.sequence(F.lit(0), F.col("n_tok") - 1),
        lambda pos: F.pmod(_h(16, F.col("doc_id"), pos), F.lit(VOCAB)).cast("int"),
    )
    return df.select("doc_id", tokens.alias("tokens"), "n_tok", "source", "deleted")
