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


def test_schema_evolution_add_column_roundtrip(spark, tmp_table_dir):
    """evolve -> old files null-fill -> new-schema append -> scan; the old
    writer shape is rejected post-evolution (fail-loudly stays on)."""
    t = make_sequences_table(spark, tmp_table_dir, n_rows=300, small_files=2)
    pre_rows = t.read(spark).count()

    t.add_column("lang", "string")
    got = t.read(spark)
    assert got.schema["lang"].dataType.simpleString() == "string"
    assert got.filter("lang is null").count() == pre_rows  # old files null-fill

    fresh = (
        sequences(spark, 320, max_tok_cap=64)
        .filter("cast(substring(doc_id, -12, 12) as long) >= 300")
        .withColumn("lang", F.lit("en"))
    )
    t.append(fresh)
    assert t.read(spark).filter("lang = 'en'").count() == 20
    assert t.read(spark).count() == pre_rows + 20

    # old-shaped writers now fail loudly
    with pytest.raises(ValueError, match="schema drift"):
        t.append(sequences(spark, 10, max_tok_cap=64))
    # a reloaded handle sees the evolved schema
    assert "lang" in [f.name for f in LakeTable.load(tmp_table_dir).schema.fields]


def test_schema_evolution_rejects_drops_and_type_changes(spark, tmp_table_dir):
    from pyspark.sql import types as T

    t = make_sequences_table(spark, tmp_table_dir, n_rows=100, small_files=2)
    with pytest.raises(ValueError, match="cannot drop"):
        t.evolve_schema(T.StructType([f for f in t.schema.fields if f.name != "n_tok"]))
    # same fields but n_tok int->long must be rejected
    mutated = T.StructType([
        T.StructField(f.name, T.LongType() if f.name == "n_tok" else f.dataType, f.nullable)
        for f in t.schema.fields
    ])
    with pytest.raises(ValueError, match="cannot change type"):
        t.evolve_schema(mutated)
    with pytest.raises(ValueError, match="must be nullable"):
        t.evolve_schema(T.StructType(t.schema.fields + [T.StructField("x", T.IntegerType(), False)]))
    with pytest.raises(ValueError, match="already exists"):
        t.add_column("n_tok", "int")


def test_schema_evolution_rejects_nullability_flip(spark, tmp_table_dir):
    from pyspark.sql import types as T

    t = make_sequences_table(spark, tmp_table_dir, n_rows=100, small_files=2)
    t.add_column("lang", "string")  # nullable by rule; old files hold NULLs
    flipped = T.StructType([
        T.StructField(f.name, f.dataType, False if f.name == "lang" else f.nullable)
        for f in t.schema.fields
    ])
    with pytest.raises(ValueError, match="non-nullable"):
        t.evolve_schema(flipped)
