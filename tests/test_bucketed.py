"""Bucketed co-located joins: same-key, same-count bucketed tables must
join with ZERO exchange (the shuffle-free path every repeated join
against per-document state rides at scale), and the co-located join's
result must equal the plain shuffled join's."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pymfe_spark.sources.bucketed import colocated_join, write_bucketed
from tests.conftest import SF_SMOKE
from tests.test_plans import explain_str


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    quality = docs.select(
        "doc_id", (F.length("text") % 97).alias("q_score")
    )
    write_bucketed(docs, "b_docs", "doc_id", n_buckets=8)
    write_bucketed(quality, "b_quality", "doc_id", n_buckets=8)
    yield "b_docs", "b_quality"
    spark.sql("DROP TABLE IF EXISTS b_docs")
    spark.sql("DROP TABLE IF EXISTS b_quality")


def test_colocated_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    # force the SMJ path: a broadcast join would hide the bucket layout
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, left, right, "doc_id")
        plan = explain_str(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, (
            "bucketed join must not shuffle either side:\n" + plan
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_colocated_join_matches_plain_join(spark, bucketed_tables):
    left, right = bucketed_tables
    co = colocated_join(spark, left, right, "doc_id")
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    quality = docs.select("doc_id", (F.length("text") % 97).alias("q_score"))
    plain = docs.join(quality, "doc_id")
    a = sorted(
        (r["doc_id"], r["q_score"]) for r in co.select("doc_id", "q_score").collect()
    )
    b = sorted(
        (r["doc_id"], r["q_score"])
        for r in plain.select("doc_id", "q_score").collect()
    )
    assert a == b and len(a) > 0
