"""Bucketed co-located joins: pre-bucketing both sides of a recurring join
key eliminates the shuffle (the task brief's 'bucketing for co-located
joins'; at 100TB a nightly doc_id-bucketed layout amortizes every downstream
MERGE/anti-join's exchange)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # session warehouse dir is fixed at session start; tables live there
    return str(tmp_path_factory.mktemp("wh"))


def test_bucketed_join_has_no_exchange(spark, tmp_path_factory):
    from octocode_spark.datagen import sequence_updates, sequences
    from octocode_spark.plans.explain import formatted_plan

    base = sequences(spark, 2000, max_tok_cap=32).select("doc_id", "n_tok", "source")
    upd = sequence_updates(spark, 2000, 500, max_tok_cap=32).select("doc_id", "deleted")

    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for tbl in ("b_base", "b_upd"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(f"{wh}/{tbl}", ignore_errors=True)  # dropped-table dirs linger
    base.write.bucketBy(8, "doc_id").sortBy("doc_id").mode("overwrite").saveAsTable("b_base")
    upd.write.bucketBy(8, "doc_id").sortBy("doc_id").mode("overwrite").saveAsTable("b_upd")

    import re

    # disable broadcast so the planner must pick SMJ — the case bucketing
    # exists for (at 100TB neither side broadcasts)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_base").join(spark.table("b_upd"), "doc_id")
        plan = formatted_plan(joined)
        # co-located: SMJ with NO shuffle exchange on either side
        assert "SortMergeJoin" in plan, plan[:2000]
        assert not re.search(r"\bExchange\b", plan), plan[:2000]
        assert joined.count() > 0

        # baseline sanity: the same join over raw (unbucketed) data shuffles
        raw_plan = formatted_plan(base.join(upd, "doc_id"))
        assert re.search(r"\bExchange\b", raw_plan)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    spark.sql("DROP TABLE IF EXISTS b_base")
    spark.sql("DROP TABLE IF EXISTS b_upd")
