"""Persisted IVF vector index — the reference's on-disk vector index
(src/store/vector_optimizer.rs:130-197, built once at ingest and reused
across queries) as a `_cell`-partitioned LakeTable.

The split of concerns:

- operators/ann.build_ivf_index — trains the coarse quantizer and assigns
  cells (compute);
- this module — PERSISTS the assignment partitioned by `_cell` and stores
  the centroids in table properties (a few KB of JSON), so a fresh session
  loads the index without touching the corpus;
- ivf_search_persisted — ranks centroids driver-side, then plans the scan
  with `files(partition_filter={"_cell": ...})`: probing n_probe of
  n_clusters cells is MANIFEST-level file skipping, not a filter over a
  cached DataFrame. At 100 TB the non-probed cells' files are never opened.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from octocode_spark.lakehouse.table import DataFile, LakeTable
from octocode_spark.operators.ann import IvfIndex, brute_force_topk, rank_cells


def _centroid_frame(spark: SparkSession, centroids) -> DataFrame:
    """(_cell, _cen array<double>) — small enough to broadcast at the max
    adaptive cell count (1024 × dim doubles)."""
    rows = [(int(i), [float(x) for x in c]) for i, c in enumerate(centroids)]
    return spark.createDataFrame(rows, "_cell: int, _cen: array<double>")


def persist_ivf_index(index: IvfIndex, root: str, quantize: str | None = None) -> LakeTable:
    """Write the cell assignment as a LakeTable partitioned by `_cell`;
    centroids + index config ride in the table properties.

    ``quantize="sq8"`` stores scalar-quantized vectors — per-vector scale =
    max|v|/127, components rounded to int8 range (the reference ships SQ 4×
    compression on its IVF index, src/store/vector_optimizer.rs:26-36,
    src/config.rs:140-143). Component values are small ints, which parquet's
    dictionary/bit-pack encodings store in ~1 byte; the search path decodes
    with a JVM transform (q·scale) before the exact cosine re-rank, so the
    only accuracy cost is the ~0.4% SQ8 rounding — recall gate in tests.

    ``quantize="rq1"`` stores 1 bit per dimension — the RaBitQ 32×-vs-float32
    tier the reference pairs with IVF for large-scale search
    (vector_optimizer.rs:26-36,52-54): sign bits packed into ceil(dim/64)
    longs plus the per-vector L2 norm as `_scale`. The search path pre-ranks
    in-cell by Hamming distance (xor + bit_count, pure codegen) and
    exact-re-ranks a shortlist against caller-supplied full vectors — see
    ivf_search_persisted(rerank_vectors=...). At 100 TB of embeddings the
    8× storage delta vs sq8 is the difference between an index that fits
    and one that doesn't."""
    sample = index.assigned.schema
    dim = len(index.centroids[0])
    assigned = index.assigned
    if quantize in ("rq1", "rq1c"):
        from octocode_spark.operators.ann import rq1_code_col

        v = F.col(index.vec_col).cast("array<double>")
        if quantize == "rq1c":
            # CENTERED codes (the actual RaBitQ shape,
            # vector_optimizer.rs:26-54: bits quantize the RESIDUAL against
            # the cell centroid, not the raw vector): on clustered corpora
            # every vector in a cell shares its centroid's sign pattern, so
            # global-sign codes cannot discriminate WITHIN the cell —
            # measured recall@10 0.225 on a 16-mode corpus vs 0.9+ centered.
            # The per-cell centroid rides in a broadcast-joined frame; the
            # coded space matches the assignment space (normalized when the
            # index is spherical).
            assigned = assigned.join(
                F.broadcast(_centroid_frame(assigned.sparkSession, index.centroids)),
                "_cell",
            )
            if index.normalized:
                nrm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
                v = F.when(nrm > 0, F.transform(v, lambda x: x / nrm)).otherwise(v)
            v = F.zip_with(v, F.col("_cen"), lambda x, c: x - c)
        norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
        fields = [
            T.StructField(index.id_col, next(f for f in sample.fields if f.name == index.id_col).dataType, True),
            T.StructField(index.vec_col, T.ArrayType(T.LongType()), True),
            T.StructField("_scale", T.DoubleType(), True),
            T.StructField("_cell", T.IntegerType(), False),
        ]
        sel = [
            F.col(index.id_col),
            rq1_code_col(v, dim).alias(index.vec_col),
            norm.alias("_scale"),
            F.col("_cell"),
        ]
    elif quantize == "sq8":
        v = F.col(index.vec_col).cast("array<double>")
        scale = F.greatest(
            F.aggregate(v, F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x))) / F.lit(127.0),
            F.lit(1e-30),
        )
        fields = [
            T.StructField(index.id_col, next(f for f in sample.fields if f.name == index.id_col).dataType, True),
            T.StructField(index.vec_col, T.ArrayType(T.IntegerType()), True),
            T.StructField("_scale", T.DoubleType(), True),
            T.StructField("_cell", T.IntegerType(), False),
        ]
        sel = [
            F.col(index.id_col),
            F.transform(v, lambda x: F.round(x / scale).cast("int")).alias(index.vec_col),
            scale.alias("_scale"),
            F.col("_cell"),
        ]
    elif quantize is None:
        fields = [f for f in sample.fields if f.name in (index.id_col, index.vec_col)]
        fields = fields + [T.StructField("_cell", T.IntegerType(), False)]
        sel = [F.col(index.id_col), F.col(index.vec_col), F.col("_cell")]
    else:
        raise ValueError(
            f"unknown quantize mode {quantize!r} (None, 'sq8', 'rq1', or 'rq1c')"
        )
    schema = T.StructType(fields)
    t = LakeTable.create(
        root,
        schema,
        partition_by=["_cell"],
        properties={
            "ivf.centroids": json.dumps([[float(x) for x in c] for c in index.centroids]),
            "ivf.id_col": index.id_col,
            "ivf.vec_col": index.vec_col,
            "ivf.normalized": "true" if index.normalized else "false",
            "ivf.quantize": quantize or "none",
            "ivf.dim": str(dim),
        },
    )
    t.append(assigned.select(*sel))
    # sizing metadata for the drift gates: rows from the manifests (no scan)
    t.update_properties({
        "ivf.indexed_rows": str(sum(f.records for f in t.files())),
        "ivf.n_clusters": str(len(index.centroids)),
    })
    return t


def load_ivf_index(root: str) -> LakeTable:
    t = LakeTable.load(root)
    if "ivf.centroids" not in t.meta.properties:
        raise ValueError(f"{root} is not a persisted IVF index (no ivf.centroids)")
    return t


def ivf_append(table: LakeTable, new_vectors: DataFrame, recluster_on_drift: bool = True):
    """Incremental index maintenance: assign NEW vectors to the EXISTING
    centroids and append them to the cell-partitioned table — no re-train on
    the normal path.

    DRIFT GATE (reference vector_optimizer.rs:226-258, round-3 verdict ask
    #4): after the append, if the corpus grew >50% past ``ivf.indexed_rows``
    (the row count the quantizer was trained on — checked from manifests,
    no scan), ``recluster_on_drift`` triggers ivf_recluster: re-train at the
    NEW adaptive cell count and rewrite the assignment. Pass False to defer
    (e.g. batch many appends, then recluster once); ivf_needs_recluster
    reports the pending drift either way.

    Assignment is a pure JVM expression: per-centroid squared L2 distance
    via zip_with against the centroid literals (normalized first when the
    index is spherical), cell = position of the array minimum — no Python,
    no ML model object needed on the executors. Returns the commit
    Snapshot (of the recluster overwrite when the gate fired)."""
    props = table.meta.properties
    centroids = json.loads(props["ivf.centroids"])
    id_col, vec_col = props["ivf.id_col"], props["ivf.vec_col"]
    normalized = props.get("ivf.normalized") == "true"
    v = F.col(vec_col).cast("array<double>")
    if normalized:
        nrm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
        v = F.when(nrm > 0, F.transform(v, lambda x: x / nrm)).otherwise(v)
    dists = F.array(*[
        F.aggregate(
            F.zip_with(v, F.array(*[F.lit(float(c)) for c in cen]), lambda x, c: (x - c) * (x - c)),
            F.lit(0.0),
            lambda a, d: a + d,
        )
        for cen in centroids
    ])
    cell = (F.array_position(dists, F.array_min(dists)) - 1).cast("int").alias("_cell")
    quant = props.get("ivf.quantize", "none")
    if quant == "sq8":
        # quantize appended vectors exactly like the build did, so the table
        # stays schema- and semantics-uniform
        raw = F.col(vec_col).cast("array<double>")
        scale = F.greatest(
            F.aggregate(raw, F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x))) / F.lit(127.0),
            F.lit(1e-30),
        )
        assigned = new_vectors.select(
            F.col(id_col),
            F.transform(raw, lambda x: F.round(x / scale).cast("int")).alias(vec_col),
            scale.alias("_scale"),
            cell,
        )
    elif quant in ("rq1", "rq1c"):
        from octocode_spark.operators.ann import rq1_code_col

        dim = int(props["ivf.dim"])
        raw = F.col(vec_col).cast("array<double>")
        if quant == "rq1c":
            coded = raw
            if normalized:
                nrm2 = F.sqrt(F.aggregate(raw, F.lit(0.0), lambda a, x: a + x * x))
                coded = F.when(nrm2 > 0, F.transform(raw, lambda x: x / nrm2)).otherwise(raw)
            with_cell = new_vectors.withColumn("_cell", cell).join(
                F.broadcast(_centroid_frame(new_vectors.sparkSession, centroids)), "_cell"
            )
            res = F.zip_with(coded, F.col("_cen"), lambda x, c: x - c)
            norm = F.sqrt(F.aggregate(res, F.lit(0.0), lambda a, x: a + x * x))
            assigned = with_cell.select(
                F.col(id_col),
                rq1_code_col(res, dim).alias(vec_col),
                norm.alias("_scale"),
                F.col("_cell"),
            )
        else:
            norm = F.sqrt(F.aggregate(raw, F.lit(0.0), lambda a, x: a + x * x))
            assigned = new_vectors.select(
                F.col(id_col),
                rq1_code_col(raw, dim).alias(vec_col),
                norm.alias("_scale"),
                cell,
            )
    elif quant in ("none", ""):
        assigned = new_vectors.select(F.col(id_col), F.col(vec_col), cell)
    else:
        raise ValueError(f"ivf_append: unsupported quantize mode {quant!r}")
    snap = table.append(assigned)
    if recluster_on_drift and ivf_needs_recluster(table):
        snap = ivf_recluster(new_vectors.sparkSession, table)
    return snap


def ivf_needs_recluster(table: LakeTable) -> bool:
    """True when the corpus drifted past the trained layout: >50% row growth
    since training, or the cell count is >50% off today's adaptive optimum.
    Pure metadata — manifests for rows, properties for the trained state."""
    from octocode_spark.operators.ann import (
        calculate_ivf_params,
        needs_reindex,
        should_recreate_index,
    )

    table.refresh()
    props = table.meta.properties
    indexed_rows = int(props.get("ivf.indexed_rows", "0"))
    current_rows = sum(f.records for f in table.files())
    if needs_reindex(current_rows, indexed_rows):
        return True
    n_clusters = int(props.get("ivf.n_clusters", "0")) or len(json.loads(props["ivf.centroids"]))
    return should_recreate_index(n_clusters, calculate_ivf_params(current_rows))


def _read_dequantized(spark: SparkSession, table: LakeTable) -> DataFrame:
    """(id_col, vec_col array<double>) view of the stored corpus, decoding
    whatever quantization the index carries."""
    props = table.meta.properties
    id_col, vec_col = props["ivf.id_col"], props["ivf.vec_col"]
    df = table.read(spark)
    quant = props.get("ivf.quantize")
    if quant == "sq8":
        df = df.withColumn(
            vec_col, F.transform(F.col(vec_col), lambda q: q.cast("double") * F.col("_scale"))
        )
    elif quant in ("rq1", "rq1c"):
        # sign reconstruction v̂_i = (±1) · scale/√dim — all the code retains;
        # ample for re-training a COARSE quantizer (directions survive,
        # magnitudes are per-vector uniform). Centered codes add the cell
        # centroid back (the code stored the residual's signs).
        import math

        dim = int(props["ivf.dim"])
        code = F.col(vec_col)
        sign_part = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (
                F.getbit(
                    F.element_at(code, F.floor(i / F.lit(64)).cast("int") + F.lit(1)),
                    i % F.lit(64),
                ).cast("double") * F.lit(2.0) - F.lit(1.0)
            ) * F.col("_scale") / F.lit(math.sqrt(dim)),
        )
        if quant == "rq1c":
            centroids = json.loads(props["ivf.centroids"])
            df = df.join(F.broadcast(_centroid_frame(spark, centroids)), "_cell")
            df = df.withColumn(vec_col, F.zip_with(sign_part, F.col("_cen"), lambda s, c: s + c))
        else:
            df = df.withColumn(vec_col, sign_part)
    return df.select(id_col, vec_col)


def ivf_recluster(spark: SparkSession, table: LakeTable):
    """Re-train the coarse quantizer over the CURRENT corpus at the adaptive
    cell count and atomically rewrite the assignment (overwrite_all — one
    snapshot, time-travel keeps the old layout). The reference's
    recreate-index-on-drift (vector_optimizer.rs:226-258). SQ8 indexes
    retrain on dequantized vectors: centroid positions shift by at most the
    SQ8 rounding noise, irrelevant to a coarse quantizer."""
    from octocode_spark.operators.ann import build_ivf_index, calculate_ivf_params

    props = dict(table.meta.properties)
    id_col, vec_col = props["ivf.id_col"], props["ivf.vec_col"]
    normalized = props.get("ivf.normalized") == "true"
    quant = props.get("ivf.quantize", "none")
    current_rows = sum(f.records for f in table.files())
    params = calculate_ivf_params(current_rows)
    n_clusters = params.n_clusters if params.should_create_index else max(
        int(props.get("ivf.n_clusters", "2")), 2
    )
    corpus = _read_dequantized(spark, table)
    index = build_ivf_index(
        corpus, n_clusters, id_col=id_col, vec_col=vec_col, cache=False, normalize=normalized
    )
    if quant == "sq8":
        v = F.col(vec_col).cast("array<double>")
        scale = F.greatest(
            F.aggregate(v, F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x))) / F.lit(127.0),
            F.lit(1e-30),
        )
        sel = [
            F.col(id_col),
            F.transform(v, lambda x: F.round(x / scale).cast("int")).alias(vec_col),
            scale.alias("_scale"),
            F.col("_cell"),
        ]
    elif quant in ("rq1", "rq1c"):
        from octocode_spark.operators.ann import rq1_code_col

        dim = int(props["ivf.dim"])
        v = F.col(vec_col).cast("array<double>")
        if quant == "rq1c":
            if normalized:
                nrm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
                v = F.when(nrm > 0, F.transform(v, lambda x: x / nrm)).otherwise(v)
            v = F.zip_with(v, F.col("_cen"), lambda x, c: x - c)
        norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
        sel = [
            F.col(id_col),
            rq1_code_col(v, dim).alias(vec_col),
            norm.alias("_scale"),
            F.col("_cell"),
        ]
    else:
        sel = [F.col(id_col), F.col(vec_col), F.col("_cell")]
    reassigned = index.assigned
    if quant == "rq1c":
        reassigned = reassigned.join(
            F.broadcast(_centroid_frame(spark, index.centroids)), "_cell"
        )
    snap = table.overwrite_all(reassigned.select(*sel))
    table.update_properties({
        "ivf.centroids": json.dumps([[float(x) for x in c] for c in index.centroids]),
        "ivf.indexed_rows": str(current_rows),
        "ivf.n_clusters": str(n_clusters),
    })
    return snap


def probe_files(table: LakeTable, cells: list[int]) -> list[DataFile]:
    """The files of exactly the probed cells — manifest partition pruning,
    no file outside the n_probe cells is ever planned."""
    out: list[DataFile] = []
    for c in cells:
        out.extend(table.files(partition_filter={"_cell": str(c)}))
    return out


def ivf_search_persisted(
    spark: SparkSession,
    table: LakeTable,
    query: list[float],
    k: int = 10,
    n_probe: int = 2,
    rerank_vectors: DataFrame | None = None,
    shortlist: int | None = None,
) -> DataFrame:
    """QUERY PATH against the persisted index: centroids from table
    properties (no corpus IO), probe cells planned as a file list via the
    manifests, exact cosine re-rank inside those files only.

    rq1/rq1c indexes pre-rank the probed cells by HAMMING distance to the
    query's sign code (xor + bit_count, whole-stage codegen) and keep a
    shortlist of ``shortlist`` candidates. The default ADAPTS to the probed
    population — max(10·k, probed_rows/16, 100) capped at 8192 (probed_rows
    read from the manifests, no scan): measured on a 16-mode corpus, recall
    rises 0.325→0.80 going shortlist 100→1600 of 30k probed at FLAT latency
    (the rerank is a broadcast fetch either way), so a fixed small default
    silently caps recall. With ``rerank_vectors`` — a (id_col, vec_col)
    frame holding the FULL vectors, e.g. the source corpus — the shortlist
    ids are fetched by a broadcast semi-join and exact-cosine re-ranked,
    the RaBitQ search shape. Without it, results carry the Hamming-derived
    cosine estimate cos(π·h/dim).

    ``rq1c`` (centered/residual codes — the actual RaBitQ shape) searches
    with a PER-CELL query code: signs of (q̂ − centroid_cell), packed
    driver-side, broadcast-joined on _cell, compared with the codegen
    xor/bit_count column kernel."""
    import math

    props = table.meta.properties
    centroids = json.loads(props["ivf.centroids"])
    normalized = props.get("ivf.normalized") == "true"
    id_col, vec_col = props["ivf.id_col"], props["ivf.vec_col"]
    cells = rank_cells(centroids, query, normalized)[:n_probe]
    files = probe_files(table, cells)
    cand = table.read_files(spark, files)
    quant = props.get("ivf.quantize")
    if quant in ("rq1", "rq1c"):
        from octocode_spark.operators.ann import (
            rq1_hamming,
            rq1_hamming_cols,
            rq1_query_code,
        )

        dim = int(props["ivf.dim"])
        if quant == "rq1c":
            # centered codes: the query's code differs per probed cell —
            # signs of (q̂ − centroid_cell), packed driver-side and joined in
            # as a tiny broadcast frame keyed by _cell
            q = [float(x) for x in query]
            if normalized:
                n2 = sum(x * x for x in q) ** 0.5
                if n2 > 0:
                    q = [x / n2 for x in q]
            qrows = [
                (int(c), rq1_query_code([q[j] - centroids[c][j] for j in range(dim)]))
                for c in cells
            ]
            qframe = spark.createDataFrame(qrows, "_cell: int, _qc: array<long>")
            hm = rq1_hamming_cols(vec_col, "_qc", (dim + 63) // 64)
            cand = cand.join(F.broadcast(qframe), "_cell")
        else:
            hm = rq1_hamming(vec_col, rq1_query_code(query))
        probed_rows = sum(f.records for f in files)
        short = (
            cand.select(F.col(id_col), hm.alias("_hm"))
            .orderBy(F.col("_hm").asc(), F.col(id_col).asc())  # TakeOrderedAndProject
            .limit(shortlist or min(8192, max(10 * k, probed_rows // 16, 100)))
        )
        if rerank_vectors is not None:
            fetched = rerank_vectors.join(F.broadcast(short.select(id_col)), id_col, "inner")
            return brute_force_topk(fetched, query, k, id_col, vec_col)
        if quant == "rq1c":
            # centered codes measure the RESIDUAL angle: cos(π·h/dim) over
            # them does NOT approximate the query-vector cosine (a tight
            # cluster would report ~0.0 for true-cosine-0.99 neighbors), so
            # refuse instead of returning a semantically wrong score column
            raise ValueError(
                "rq1c search requires rerank_vectors: the Hamming distance is "
                "over residual codes, whose angle estimate is not a cosine "
                "approximation of the stored vectors"
            )
        approx = F.round(F.cos(F.lit(math.pi) * F.col("_hm") / F.lit(float(dim))), 6)
        return (
            short.select(F.col(id_col), approx.alias("cosine"))
            .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
            .limit(k)
        )
    cand = cand.drop("_cell")
    if quant == "sq8":
        # JVM-side dequantize: v̂ = q · scale, then the exact cosine re-rank
        cand = cand.withColumn(
            vec_col,
            F.transform(F.col(vec_col), lambda q: q.cast("double") * F.col("_scale")),
        ).drop("_scale")
    return brute_force_topk(cand, query, k, id_col, vec_col)
