"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query at sf0.001 (weighted-RRF fusion, the
                reference's core rerank semantics, src/store/weighted_rrf.rs).
queries()     — one entry per implemented operator family (SURVEY.md §2),
                each (spark, sf_dir) -> DataFrame.
oracle_sql()  — DuckDB-equivalent SQL per oracle-expressible query; the
                xxhash64/pandas-UDF-based ops are rows-only by design.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

_SHIPPED: set[int] = set()


def _ensure_shipped(spark: SparkSession) -> None:
    """Make octocode_spark importable on EXECUTOR python workers.

    The driver-side sys.path insert above does not propagate to the worker
    processes that run pandas UDFs; addPyFile (the spark-submit --py-files
    mechanism, applied at runtime) does. Idempotent per SparkContext.
    """
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    import tempfile
    import zipfile

    zpath = Path(tempfile.gettempdir()) / f"octocode_spark_{abs(hash(_REPO))}.zip"
    if not zpath.exists():
        pkg = Path(_REPO) / "octocode_spark"
        with zipfile.ZipFile(str(zpath) + ".tmp", "w") as zf:
            for p in sorted(pkg.rglob("*.py")):
                zf.write(p, p.relative_to(Path(_REPO)))
        Path(str(zpath) + ".tmp").rename(zpath)
    sc.addPyFile(str(zpath))
    _SHIPPED.add(key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: hybrid search (keyword ∥ vector cosine → weighted RRF),
    the reference's core read path, at sf0.001."""
    _ensure_shipped(spark)
    from octocode_spark.queries import queries as _qs

    return _qs()["q38_hybrid_search"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from octocode_spark.queries import queries as _qs

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_shipped(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in _qs().items()}


def oracle_sql() -> dict[str, str]:
    from octocode_spark.queries import oracle_sql as _os

    return _os()
