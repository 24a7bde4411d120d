"""Deduplication operators for training-data pipelines over `documents`.

Five tiers, each a declarative DataFrame composition:

- exact            — hash-groupBy on the canonical fingerprint (A5/U1).
- ngram_jaccard    — shingle sets + explode/join/agg pairwise Jaccard.
- minhash_lsh      — shingle→minhash(64 perms)→band→bucket-join candidate
                     pairs; verify with exact Jaccard. The scale path: the
                     cross-product never materializes, only same-bucket pairs.
- simhash          — 64-bit simhash + hamming-distance candidate filter.
- embedding cosine — see operators/ann.py (near-dup = cosine > τ).

Determinism: every hash is xxhash64 with fixed literal seeds — same corpus,
same pairs, any cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from octocode_spark.operators.text import fingerprint


# ---------------------------------------------------------------- exact

def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of bitwise-identical (canonicalized) documents:
    (fingerprint, n_docs, doc_ids) for groups with n_docs > 1."""
    return (
        docs.select("doc_id", fingerprint(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sort_array(F.collect_list("doc_id")).alias("doc_ids"))
        .filter(F.col("n_docs") > 1)
    )


def dedup_exact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep the min-doc_id representative per fingerprint group — the
    reference's content-hash dedup (src/embedding/mod.rs:229-234) as a
    min_by aggregate (one shuffle, map-side combinable)."""
    fp = docs.withColumn("fingerprint", fingerprint(F.col(text_col)))
    keep = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
    return fp.join(keep, ["fingerprint", "doc_id"], "left_semi").drop("fingerprint")


def dedup_keep_best(
    docs: DataFrame, score, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Canonical-representative dedup: within each exact-duplicate group keep
    the row maximizing ``score`` (a Column, e.g. text.quality_score), ties
    broken by min id — the training-data shape where near-identical crawls
    differ in boilerplate and you keep the cleanest copy. One shuffle
    (max_by on a total-ordered composite), same cost as dedup_exact."""
    from pyspark.sql import Window

    fp = docs.withColumn("fingerprint", fingerprint(F.col(text_col))).withColumn(
        "_score", score
    )
    # window pick works for ANY orderable id type (strings included), unlike
    # a max_by composite that would need numeric negation for the tie-break
    w = Window.partitionBy("fingerprint").orderBy(
        F.col("_score").desc(), F.col(id_col).asc()
    )
    return (
        fp.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("fingerprint", "_score", "_rn")
    )


def spread_for_compute(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Fan a starved scan out to the session's full parallelism before
    CPU-heavy per-row work (shingling, per-permutation hashing).

    A small corpus arrives as one parquet file with one row group, so every
    downstream projection/explode runs as ONE task no matter how many cores
    the session has (guide §2.5 input skew / §6 small files — measured 32×
    idle on the sketch queries). The hash repartition moves only the scan's
    bytes (cheap, text-sized) and is a NO-OP at scale: when the scan already
    has >= defaultParallelism splits — the 100-TB case — the frame is
    returned untouched, so no extra exchange ever reaches a big input.

    Call this on RAW SCANS only: probing partition count of a post-shuffle
    frame would materialize its stages early (AQE), and such frames are
    already parallel."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, F.col(key_col))
    return df


# ---------------------------------------------------------------- shingles

def shingle_array(text: F.Column, n: int = 3, hash_shingles: bool = True) -> F.Column:
    """Distinct word n-gram shingles of one text value as an array column.

    hash_shingles=True gives 8-byte xxhash64 shingles (the scale path: 10×
    narrower shuffle than raw trigram strings); False keeps raw strings
    (oracle-comparable in any SQL engine)."""
    words = F.split(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "), " ")
    gram = lambda i: F.concat_ws(" ", F.slice(words, i + 1, n))  # noqa: E731
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        (lambda i: F.xxhash64(gram(i))) if hash_shingles else gram,
    )
    return F.array_distinct(grams)


def shingles(docs: DataFrame, text_col: str = "text", n: int = 3,
             id_col: str = "doc_id", hash_shingles: bool = True) -> DataFrame:
    """Distinct word n-gram shingles per doc: (doc_id, shingle).

    No .distinct() here: shingle_array already array_distinct's per doc, so
    the exploded rows are unique by construction — a distinct() would add a
    full (doc_id, shingle) shuffle to every consumer (q16's single biggest
    cost before round 5) for nothing."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingle_array(F.col(text_col), n, hash_shingles)).alias("shingle"),
    )


def ngram_jaccard_pairs(
    docs: DataFrame, text_col: str = "text", n: int = 3, threshold: float = 0.8,
    max_shingle_df: int | None = None, hash_shingles: bool = True,
) -> DataFrame:
    """All pairs with Jaccard(shingles_a, shingles_b) ≥ threshold.

    Shape: |A∩B| via self-join on shingle + pair-count agg; |A∪B| from per-doc
    sizes. ``max_shingle_df`` drops ultra-common shingles (stopword n-grams)
    before the self-join — the classic frequency cut that keeps the join from
    exploding at corpus scale.

    Shingle explosion here is CODEGEN-NATIVE (round 6), not the shared
    ``shingles()`` array path: transform-lambdas and array_distinct are
    CodegenFallback, i.e. interpreted per element — measured 17.5s cold /
    2.2s warm for the df-count stage at sf1.0 (the gap is JIT warming the
    expression-tree interpreter). Exploding positions and hashing with
    plain expressions whole-stage-compiles: 5.0s cold, same rows. Per-doc
    dedup (array_distinct's job) becomes ``distinct()`` whose partial
    aggregate dedups map-side — a doc's rows never leave their task, so
    the exchange carries already-unique 16-byte pairs, and every consumer
    below reuses that one exchange instead of re-running the explode.
    """
    words = F.split(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " ")
    pos = docs.select(F.col("doc_id"), words.alias("_ws")).select(
        "doc_id",
        "_ws",
        F.explode(F.sequence(F.lit(0), F.greatest(F.size("_ws") - n, F.lit(0)))).alias("_i"),
    )
    gram = F.concat_ws(" ", F.slice(F.col("_ws"), F.col("_i") + 1, n))
    sh = pos.select(
        "doc_id", (F.xxhash64(gram) if hash_shingles else gram).alias("shingle")
    ).distinct()
    if max_shingle_df:
        rare = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df")).filter(
            F.col("df") <= max_shingle_df
        )
        sh = sh.join(rare.select("shingle"), "shingle", "left_semi")
    # materialize the (doc_id, shingle) frame ONCE: the per-doc sizes and
    # BOTH self-join sides consume it, and without a lineage cut Catalyst
    # re-plans the corpus scan + explode (+ the frequency-cut aggregation)
    # for every leg — measured 8 parquet scans / 8 explodes in the
    # un-checkpointed plan, i.e. 8× read amplification at corpus scale. The
    # checkpointed frame is narrow (doc_id + 8-byte hashed shingle).
    sh = sh.localCheckpoint(eager=True)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc_id").alias("a"), "shingle")
    b = sh.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sz_a")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("sz_b")), "b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------- minhash + LSH

def minhash_signatures(docs: DataFrame, text_col: str = "text", n: int = 3,
                       num_perms: int = 64) -> DataFrame:
    """(doc_id, sig: array<long>) — minhash via the h_i(x) = xxhash64(x, i)
    trick (equivalent to random permutations).

    CODEGEN-NATIVE shape (round 6, bit-identical values — pinned by the
    crafted-fixture tests and an exceptAll A/B at sf1.0): explode trigram
    positions, hash each with plain expressions, take num_perms min()
    aggregates per doc. The round-5 per-row shape (array_min over
    transform-lambdas, zero exchanges) evaluates every element through the
    interpreted expression tree — transform/aggregate are CodegenFallback —
    measured 12.8s cold / 2.5s warm for 16 perms at sf1.0 vs 4.4s cold
    here, where the whole pipeline whole-stage-compiles. min() is map-side
    combinable and a doc's positions never leave their scan task, so the
    partial aggregate emits exactly ONE row per doc: the exchange carries
    #docs × num_perms longs regardless of document length (no per-doc skew,
    ~0 bytes vs corpus size at 100 TB), and when the input is already
    hash-partitioned by doc_id the exchange disappears entirely.

    Distinctness is irrelevant for min (min over a multiset == min over its
    distinct set), so no array_distinct/distinct anywhere. NULL text keeps
    a NULL signature: the null-guard sits INSIDE each min (xxhash64 would
    otherwise 'skip' the null input and hash nothing into the seed)."""
    words = F.split(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " ")
    pos = docs.select(F.col("doc_id"), words.alias("_ws")).select(
        "doc_id",
        "_ws",
        # explode_outer: a NULL text yields a NULL-position row (not zero
        # rows), so the doc stays in the output with sig elements NULL
        F.explode_outer(F.sequence(F.lit(0), F.greatest(F.size("_ws") - n, F.lit(0)))).alias("_i"),
    )
    gram_h = F.xxhash64(F.concat_ws(" ", F.slice(F.col("_ws"), F.col("_i") + 1, n)))
    sh = pos.select(
        "doc_id",
        F.when(F.col("_i").isNull(), F.lit(None).cast("long")).otherwise(gram_h).alias("_s"),
    )
    aggs = [
        F.min(
            F.when(F.col("_s").isNull(), F.lit(None).cast("long"))
            .otherwise(F.xxhash64(F.col("_s"), F.lit(i)))
        ).alias(f"_m{i}")
        for i in range(num_perms)
    ]
    grouped = sh.groupBy("doc_id").agg(*aggs)
    sig = F.array(*[F.col(f"_m{i}") for i in range(num_perms)])
    return grouped.select("doc_id", sig.alias("sig"))


def minhash_lsh_pairs(
    docs: DataFrame, text_col: str = "text", n: int = 3,
    num_perms: int = 64, bands: int = 16, threshold: float = 0.7,
) -> DataFrame:
    """Near-dup pairs via banded LSH: docs sharing ≥1 band bucket become
    candidates; candidates verified with exact shingle Jaccard ≥ threshold.

    rows/band = num_perms/bands → S-curve midpoint ≈ (1/bands)^(1/rows).
    """
    rows_per_band = num_perms // bands
    sig = minhash_signatures(docs, text_col, n, num_perms)
    band_cols = F.explode(
        F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    F.concat_ws(",", *[
                        F.element_at("sig", b * rows_per_band + r + 1).cast("string")
                        for r in range(rows_per_band)
                    ])
                ).alias("bucket"),
            )
            for b in range(bands)
        ])
    ).alias("bb")
    buckets = sig.select("doc_id", band_cols).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    left = buckets.select(F.col("doc_id").alias("a"), "band", "bucket")
    right = buckets.select(F.col("doc_id").alias("b"), "band", "bucket")
    cands = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    # verify candidates with exact Jaccard (semi-joined shingle sets only);
    # same lineage cut as ngram_jaccard_pairs — the candidate-cut shingle
    # frame feeds sizes and both intersection legs
    sh = shingles(docs, text_col, n)
    ids = cands.select(F.col("a").alias("doc_id")).union(cands.select("b")).distinct()
    sh = sh.join(ids, "doc_id", "left_semi").localCheckpoint(eager=True)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    ia = sh.select(F.col("doc_id").alias("a"), "shingle")
    ib = sh.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        cands.join(ia, "a").join(ib, ["b", "shingle"])
        .groupBy("a", "b").agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        cands.join(inter, ["a", "b"], "left")
        .na.fill({"inter": 0})
        .join(sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sz_a")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("sz_b")), "b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    broadcast_benchmark: bool = False,
) -> DataFrame:
    """Drop training documents sharing ANY word ``n``-gram with a held-out
    benchmark set — the test-set contamination filter every serious
    pretraining pipeline runs before training (n=8..13 word overlap is the
    common published criterion).

    Shape: both sides explode to hashed n-gram shingles; contaminated ids =
    semi-join docs-shingles ⋉ benchmark-shingles (8-byte keys); survivors =
    docs anti-join contaminated. The corpus is touched by exactly one
    explode+join, never pairwise. Join strategy defaults to AQE's runtime
    choice (it broadcasts a small benchmark side on its own, from MEASURED
    shuffle sizes); pass ``broadcast_benchmark=True`` only when the
    benchmark's exploded shingle set is known to fit executor memory — a
    forced hint on a large held-out set would OOM the broadcast."""
    doc_sh = shingles(docs, text_col, n, id_col=id_col)
    bench_sh = benchmark.select(
        F.explode(shingle_array(F.col(bench_text_col), n)).alias("shingle")
    ).distinct()
    if broadcast_benchmark:
        bench_sh = F.broadcast(bench_sh)
    contaminated = doc_sh.join(bench_sh, "shingle", "left_semi").select("doc_id").distinct()
    return docs.join(contaminated.withColumnRenamed("doc_id", id_col), id_col, "left_anti")


# ---------------------------------------------------------------- components

def duplicate_groups(pairs: DataFrame, a: str = "a", b: str = "b",
                     max_rounds: int = 50) -> DataFrame:
    """Connected components over near-dup pairs → (id, group_id) with
    group_id = the component's minimum id — the dedup ENDGAME: pairwise
    near-dup detection (Jaccard/LSH/SimHash/cosine) only yields edges; to
    keep one representative per duplicate CLUSTER the transitive closure
    must be grouped.

    Shape: min-label propagation WITH pointer jumping — each round (a) pulls
    the min label across edges, then (b) shortcuts every node to its
    label's label (label composition). Edge propagation alone moves labels
    one hop per round (O(diameter) rounds — a 60-link near-dup chain would
    need 60); the jump step doubles the reach each round, so convergence is
    O(log diameter) even for pathological chains. Two joins + two map-side-
    combinable min aggs per round. Deterministic at any parallelism;
    lineage truncated per round (localCheckpoint) like the BFS operators.
    """
    ed = pairs.select(F.col(a).alias("s"), F.col(b).alias("d"))
    edges = (
        ed.unionByName(ed.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("s").alias("id")).distinct()
        .withColumn("group_id", F.col("id"))
        .localCheckpoint(eager=True)
    )
    try:
        for _ in range(max_rounds):
            neigh = edges.join(labels, edges["d"] == labels["id"]).select(
                F.col("s").alias("id"), "group_id"
            )
            # materialize BEFORE the self-join: both jump sides read the same
            # checkpointed frame (no self-join attribute ambiguity, and the
            # union+agg runs once, not twice)
            pulled = (
                labels.unionByName(neigh)
                .groupBy("id")
                .agg(F.min("group_id").alias("group_id"))
                .localCheckpoint(eager=True)
            )
            # pointer jumping: follow my label to ITS label (min of both) —
            # doubles propagation distance, turning O(diameter) into O(log)
            of_label = pulled.select(
                F.col("id").alias("_lid"), F.col("group_id").alias("_lgrp")
            )
            new_labels = (
                pulled.join(of_label, pulled["group_id"] == of_label["_lid"], "left")
                .select(
                    pulled["id"].alias("id"),
                    F.least(
                        pulled["group_id"],
                        F.coalesce(F.col("_lgrp"), pulled["group_id"]),
                    ).alias("group_id"),
                )
                .localCheckpoint(eager=True)
            )
            changed = (
                new_labels.join(labels.withColumnRenamed("group_id", "_old"), "id")
                .filter(F.col("group_id") != F.col("_old"))
                .count()
            )
            # free superseded checkpoints (the BFS operators' discipline):
            # without this, block-manager memory grows linearly with rounds
            labels.unpersist()
            pulled.unpersist()
            labels = new_labels
            if changed == 0:
                return labels
        labels.unpersist()
        raise RuntimeError(f"duplicate_groups did not converge in {max_rounds} rounds")
    finally:
        edges.unpersist()


def dedup_fuzzy(docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (the min-id member) per near-dup component;
    docs in no pair survive untouched. Compose with any pair producer:
    ngram_jaccard_pairs, minhash_lsh_pairs, simhash_near_pairs,
    ann.cosine_near_pairs."""
    groups = duplicate_groups(pairs)
    losers = groups.filter(F.col("id") != F.col("group_id")).select(
        F.col("id").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")


# ---------------------------------------------------------------- simhash

def simhash64(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash over word features: sign-sum of feature-hash bits.

    Pure SQL shape: explode words → per-bit ±1 votes via bit tests →
    64 sum() aggs → reassemble bits. Map-side combinable, one shuffle.
    """
    words = F.split(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " ")
    exploded = docs.select("doc_id", F.explode(words).alias("w")).withColumn(
        "h", F.xxhash64("w")
    )
    # shiftright-based bit test: 1<<63 does not fit a signed long literal
    votes = [
        F.sum(
            F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(63)
    ]
    agg = exploded.groupBy("doc_id").agg(*votes)
    bit_terms = [
        F.when(F.col(f"v{i}") > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        for i in range(63)  # keep sign bit clear → non-negative long
    ]
    out = agg.select("doc_id", sum(bit_terms[1:], bit_terms[0]).alias("simhash"))
    return out


def simhash_near_pairs(docs: DataFrame, text_col: str = "text",
                       max_hamming: int = 3) -> DataFrame:
    """Candidate pairs with hamming(simhash_a, simhash_b) ≤ max_hamming,
    blocked on 16-bit chunks (pigeonhole: ≤3 differing bits ⇒ at least one of
    4 chunks identical) so the self-join is an equi-join, never a cross."""
    sh = simhash64(docs, text_col)
    chunks = sh.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("chunk"),
                     F.shiftright("simhash", i * 16).bitwiseAND(F.lit(0xFFFF)).alias("key"))
            for i in range(4)
        ])).alias("c"),
    ).select("doc_id", "simhash", F.col("c.chunk").alias("chunk"), F.col("c.key").alias("key"))
    a = chunks.select(F.col("doc_id").alias("a"), F.col("simhash").alias("ha"), "chunk", "key")
    b = chunks.select(F.col("doc_id").alias("b"), F.col("simhash").alias("hb"), "chunk", "key")
    pairs = (
        a.join(b, ["chunk", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "ha", "hb")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
    return pairs
