from __future__ import annotations

import shutil

import pytest

from octocode_spark import get_spark
from octocode_spark.datagen import sequences
from octocode_spark.lakehouse import LakeTable


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="octocode-tests", cpus=8, shuffle_partitions=8, driver_memory="4g")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture()
def tmp_table_dir(tmp_path):
    d = tmp_path / "tbl"
    yield str(d)
    shutil.rmtree(d, ignore_errors=True)


def make_sequences_table(
    spark, root: str, n_rows: int = 3000, small_files: int = 24, max_tok_cap: int = 256
) -> LakeTable:
    """F1 fixture: skewed sequences table written as many small files."""
    df = sequences(spark, n_rows, max_tok_cap=max_tok_cap)
    t = LakeTable.create(
        root, df.schema, partition_by=["source"], stat_cols=["n_tok", "doc_id"]
    )
    t.append(df.repartition(small_files))
    return t
