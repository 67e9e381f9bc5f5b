"""Deterministic sampling operators: stratified rebalancing must cap
over-represented strata, pass small strata through, and reproduce the
exact same row set on every run; split assignment must be stable and
near the target proportions."""

from __future__ import annotations

from pyspark.sql import functions as F

from pymfe_spark.operators.sampling import (
    sample_splits,
    sample_stratified,
    stratified_sample,
)
from tests.conftest import SF_SMOKE


def _skewed(spark):
    rows = [(i, "big" if i < 1000 else f"s{i % 5}") for i in range(1500)]
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_stratified_caps_planted_skew(spark):
    """'big' holds 1000 of 1500 rows (mean stratum = 250). At 50% of
    mean it must be cut to ~125 rows; each 100-row stratum's threshold
    (1.25x its size) clamps to SCALE, so small strata pass through
    completely untouched."""
    df = _skewed(spark)
    out = stratified_sample(df, "source", "doc_id").toPandas()
    by = out.groupby("source").size()
    # big: keep_ppm = (1500 * 500000) div (6 * 1000) = 125000 ppm
    # -> expect ~125 of 1000 (hash gate is uniform-ish; allow slack)
    assert 80 <= by["big"] <= 175, by.to_dict()
    # small strata: keep_ppm = (1500*500000) div (6*100) = 1250000
    # -> clamped to SCALE -> every row kept, bit-for-bit
    for s in ("s0", "s1", "s2", "s3", "s4"):
        assert by[s] == 100, by.to_dict()


def test_stratified_is_deterministic(spark):
    a = sorted(r["doc_id"] for r in sample_stratified(spark, SF_SMOKE).collect())
    b = sorted(r["doc_id"] for r in sample_stratified(spark, SF_SMOKE).collect())
    assert a == b and len(a) > 0


def test_splits_stable_and_proportional(spark):
    out = sample_splits(spark, SF_SMOKE).toPandas()
    assert set(out["split"].unique()) <= {"train", "val", "test"}
    frac_train = (out["split"] == "train").mean()
    assert 0.9 <= frac_train <= 0.99
    # append-stability: each doc's split is a pure function of doc_id,
    # so recomputing on a subset must agree row-for-row
    sub = sample_splits(spark, SF_SMOKE).filter(F.col("doc_id") < 100).toPandas()
    merged = sub.merge(out, on="doc_id", suffixes=("_sub", "_full"))
    assert (merged["split_sub"] == merged["split_full"]).all()


def test_mixture_respects_weights_and_budget(spark):
    """At half the corpus token budget with src0-9 weighted 2:1, the
    kept token mass must land near the budget and the per-source kept
    tokens must track desired = budget * w / Σw (hash-gate noise
    allowed; a capped source passes through whole)."""
    from pymfe_spark.operators.sampling import sample_mixture

    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    toks = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    totals = (
        d.select("source", toks.alias("n"))
        .groupBy("source").agg(F.sum("n").alias("s"))
        .toPandas().set_index("source")["s"]
    )
    budget = totals.sum() // 2
    w = {s: (2 if int(s[3:]) < 10 else 1) for s in totals.index}
    sum_w = sum(w.values())

    kept = sample_mixture(spark, SF_SMOKE).toPandas()
    kept_by = kept.groupby("source")["n_tokens"].sum()
    assert 0.85 * budget <= kept_by.sum() <= 1.1 * budget
    for s in totals.index:
        desired = min(budget * w[s] // sum_w, totals[s])
        assert abs(kept_by.get(s, 0) - desired) <= 0.35 * desired + 50, (
            s, kept_by.get(s, 0), desired
        )


def test_mixture_is_deterministic(spark):
    from pymfe_spark.operators.sampling import sample_mixture

    a = sorted(r["doc_id"] for r in sample_mixture(spark, SF_SMOKE).collect())
    b = sorted(r["doc_id"] for r in sample_mixture(spark, SF_SMOKE).collect())
    assert a == b and len(a) > 0
