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


def persist_ivf_index(index: IvfIndex, root: str, quantize: str | None = None) -> LakeTable:
    """Write the cell assignment as a LakeTable partitioned by `_cell`;
    centroids + index config ride in the table properties.

    ``quantize="sq8"`` stores scalar-quantized vectors — per-vector scale =
    max|v|/127, components rounded to int8 range (the reference ships SQ 4×
    compression on its IVF index, src/store/vector_optimizer.rs:26-36,
    src/config.rs:140-143). Component values are small ints, which parquet's
    dictionary/bit-pack encodings store in ~1 byte; the search path decodes
    with a JVM transform (q·scale) before the exact cosine re-rank, so the
    only accuracy cost is the ~0.4% SQ8 rounding — recall gate in tests."""
    sample = index.assigned.schema
    if quantize == "sq8":
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
        raise ValueError(f"unknown quantize mode {quantize!r} (None or 'sq8')")
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
        },
    )
    t.append(index.assigned.select(*sel))
    return t


def load_ivf_index(root: str) -> LakeTable:
    t = LakeTable.load(root)
    if "ivf.centroids" not in t.meta.properties:
        raise ValueError(f"{root} is not a persisted IVF index (no ivf.centroids)")
    return t


def ivf_append(table: LakeTable, new_vectors: DataFrame):
    """Incremental index maintenance: assign NEW vectors to the EXISTING
    centroids and append them to the cell-partitioned table — no re-train
    (the reference extends its index at ingest and rebuilds only on >50%
    drift, src/store/vector_optimizer.rs:226-258; `needs_recluster` is the
    drift gate here too).

    Assignment is a pure JVM expression: per-centroid squared L2 distance
    via zip_with against the centroid literals (normalized first when the
    index is spherical), cell = position of the array minimum — no Python,
    no ML model object needed on the executors. Returns the commit
    Snapshot."""
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
    elif quant in ("none", ""):
        assigned = new_vectors.select(F.col(id_col), F.col(vec_col), cell)
    else:
        raise ValueError(f"ivf_append: unsupported quantize mode {quant!r}")
    return table.append(assigned)


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
) -> DataFrame:
    """QUERY PATH against the persisted index: centroids from table
    properties (no corpus IO), probe cells planned as a file list via the
    manifests, exact cosine re-rank inside those files only."""
    props = table.meta.properties
    centroids = json.loads(props["ivf.centroids"])
    normalized = props.get("ivf.normalized") == "true"
    vec_col = props["ivf.vec_col"]
    cells = rank_cells(centroids, query, normalized)[:n_probe]
    files = probe_files(table, cells)
    cand = table.read_files(spark, files).drop("_cell")
    if props.get("ivf.quantize") == "sq8":
        # JVM-side dequantize: v̂ = q · scale, then the exact cosine re-rank
        cand = cand.withColumn(
            vec_col,
            F.transform(F.col(vec_col), lambda q: q.cast("double") * F.col("_scale")),
        ).drop("_scale")
    return brute_force_topk(cand, query, k, props["ivf.id_col"], vec_col)
