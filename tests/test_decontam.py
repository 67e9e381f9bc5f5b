"""Benchmark-decontamination operator: planted-overlap behavior plus
the scale-shape invariants (broadcast benchmark side, single exchange
of the training grams)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pymfe_spark.operators.decontam import decontam_ngram
from tests.conftest import SF_SMOKE


def _plant(spark, rows, path):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df = df.select(
        "doc_id",
        "text",
        F.lit("en").alias("lang"),
        F.lit("planted").alias("source"),
        F.length("text").cast("long").alias("n_chars"),
    )
    df.write.mode("overwrite").parquet(f"{path}/documents.parquet")
    return path


def test_planted_contamination_is_flagged(spark):
    """A training doc copying a benchmark passage must be flagged with
    high contamination; an unrelated doc must score zero."""
    bench_text = "the quick brown fox jumps over the lazy dog again " * 3
    rows = [
        (40, bench_text),  # 40 % 20 == 0 -> benchmark split
        (41, bench_text + "with a small training-side tail"),  # contaminated
        (42, "entirely unrelated words about distributed query planning "
             "and columnar execution engines at petabyte scale today"),
    ]
    sf = _plant(spark, rows, "/tmp/decontam_docs")
    out = {r["doc_id"]: r for r in decontam_ngram(spark, sf).collect()}
    assert 40 not in out, "benchmark docs must not appear as training rows"
    assert out[41]["contaminated"] is True
    assert out[41]["contamination"] > 0.5
    assert out[42]["contaminated"] is False
    assert out[42]["hit_grams"] == 0


def test_benchmark_side_is_broadcast(spark):
    """The corpus must never shuffle against the benchmark: the gram
    join has to be a broadcast join, and the only exchange of training
    data is the doc_id aggregation."""
    plan = decontam_ngram(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_repetition_flags_planted_boilerplate(spark):
    """A doc that is one phrase repeated must score near-1 on both
    repetition signals; a diverse doc must score near-0."""
    from pymfe_spark.operators.textops import text_repetition

    rows = [
        (1, "buy now " * 30),
        (2, "every word here is distinct from all of the others entirely"),
    ]
    sf = _plant(spark, rows, "/tmp/repetition_docs")
    out = {
        (r["doc_id"], r["n"]): r
        for r in text_repetition(spark, sf).collect()
    }
    assert out[(1, 2)]["dup_gram_frac"] > 0.9
    assert out[(1, 2)]["top_gram_frac"] > 0.4
    assert out[(2, 2)]["dup_gram_frac"] == 0.0
    # n=3 rows exist for both docs and track the same ordering
    assert out[(1, 3)]["dup_gram_frac"] > out[(2, 3)]["dup_gram_frac"]
