"""M5 delete-by-predicate (copy-on-write, file-granular) and the
schema-drift guard (reference policy: never silently write drift)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from octocode_spark.datagen import sequences
from octocode_spark.functions.digest import table_digest
from octocode_spark.lakehouse import LakeTable
from tests.conftest import make_sequences_table


def test_delete_where_rewrites_only_hit_files(spark, tmp_table_dir):
    t = make_sequences_table(spark, tmp_table_dir, n_rows=2000, small_files=12)
    pre_rows = t.read(spark).count()
    victims = t.read(spark).filter("source = 'github' and n_tok < 100")
    n_victims = victims.count()
    assert n_victims > 0

    before_other = {f.path for f in t.files() if f.partition != {"source": "github"}}
    snap = t.delete_where(spark, (F.col("source") == "github") & (F.col("n_tok") < 100))
    assert snap is not None and snap.operation == "delete"
    got = t.read(spark)
    assert got.count() == pre_rows - n_victims
    assert got.filter("source = 'github' and n_tok < 100").count() == 0
    # files of other partitions untouched
    after = {f.path for f in t.files()}
    assert before_other <= after


def test_delete_where_no_match_is_noop(spark, tmp_table_dir):
    t = make_sequences_table(spark, tmp_table_dir, n_rows=500, small_files=4)
    pre = table_digest(t.read(spark))
    v_before = t.meta.version
    assert t.delete_where(spark, F.col("n_tok") > 10_000_000) is None
    assert t.meta.version == v_before  # no snapshot committed
    assert table_digest(t.read(spark)) == pre


def test_delete_where_null_predicate_keeps_rows(spark, tmp_table_dir):
    """ANSI/Iceberg DELETE: rows where the predicate evaluates NULL are NOT
    deleted — neither in rewritten files nor by the hit-file scan."""
    df = sequences(spark, 300, max_tok_cap=64).withColumn(
        "n_tok",
        F.when(F.col("n_tok") % 3 == 0, F.lit(None).cast("int")).otherwise(F.col("n_tok")),
    )
    t = LakeTable.create(tmp_table_dir, df.schema, partition_by=["source"], stat_cols=["doc_id"])
    t.append(df)
    n_null = df.filter("n_tok is null").count()
    n_hit = df.filter("n_tok < 100").count()  # null rows excluded by SQL semantics
    assert n_null > 0 and n_hit > 0
    t.delete_where(spark, F.col("n_tok") < 100)
    got = t.read(spark)
    assert got.count() == df.count() - n_hit
    # every NULL row survived (the old ~predicate bug silently dropped them)
    assert got.filter("n_tok is null").count() == n_null


def test_overwrite_rejects_schema_drift(spark, tmp_table_dir):
    t = make_sequences_table(spark, tmp_table_dir, n_rows=200, small_files=2)
    bad = sequences(spark, 50, max_tok_cap=64).withColumn("extra", F.lit(1))
    with pytest.raises(ValueError, match="schema drift"):
        t.overwrite_all(bad)


def test_append_rejects_schema_drift(spark, tmp_table_dir):
    t = make_sequences_table(spark, tmp_table_dir, n_rows=200, small_files=2)
    bad = sequences(spark, 50, max_tok_cap=64).withColumn("extra", F.lit(1))
    with pytest.raises(ValueError, match="schema drift"):
        t.append(bad)
    bad2 = sequences(spark, 50, max_tok_cap=64).withColumn("n_tok", F.col("n_tok").cast("long"))
    with pytest.raises(ValueError, match="schema drift"):
        t.append(bad2)
