"""Resumability + lineage invariants (north rule): a killed backfill
restarts from the last committed bucket and converges to output
bit-identical with a single uninterrupted run."""

from __future__ import annotations

import os
import shutil

from pymfe_spark.operators.backfill import (
    backfill,
    read_backfill,
    read_lineage,
)
from pymfe_spark.operators.base import turns
from pymfe_spark.plans.extractor import MFESpark
from tests.conftest import SF_SMOKE

OUT_A = "/tmp/backfill_a"
OUT_B = "/tmp/backfill_b"


def _clean(*dirs):
    for d in dirs:
        shutil.rmtree(d, ignore_errors=True)


def test_backfill_resume_matches_single_run(spark):
    _clean(OUT_A, OUT_B)
    t = turns(spark, SF_SMOKE)
    ex = MFESpark(groups=("general",))

    # uninterrupted run
    s1 = backfill(spark, t, OUT_A, n_buckets=4, extractor=ex)
    assert s1["buckets_run"] == [0, 1, 2, 3]

    # "killed" run: complete only buckets 0-1, then simulate the kill by
    # deleting bucket 2+3 mid-state and restarting
    s2 = backfill(spark, t, OUT_B, n_buckets=4, extractor=ex)
    shutil.rmtree(os.path.join(OUT_B, "bucket=2"))
    shutil.rmtree(os.path.join(OUT_B, "bucket=3"))
    s3 = backfill(spark, t, OUT_B, n_buckets=4, extractor=ex)
    assert s3["buckets_skipped"] == [0, 1]
    assert s3["buckets_run"] == [2, 3]

    a = (
        read_backfill(spark, OUT_A)
        .orderBy("conv_id")
        .toPandas()
        .reset_index(drop=True)
    )
    b = (
        read_backfill(spark, OUT_B)
        .orderBy("conv_id")
        .toPandas()
        .reset_index(drop=True)
    )
    assert a.equals(b), "resumed backfill differs from single run"

    # idempotence: a third invocation does nothing
    s4 = backfill(spark, t, OUT_B, n_buckets=4, extractor=ex)
    assert s4["buckets_run"] == []


def test_lineage_accounts_for_every_conversation(spark):
    t = turns(spark, SF_SMOKE)
    lin = read_lineage(spark, OUT_A).toPandas()
    assert set(lin["bucket"]) == {0, 1, 2, 3}
    assert lin["input_rows"].sum() == t.count()
    n_convs = t.select("conv_id").distinct().count()
    assert lin["output_rows"].sum() == n_convs
    assert (lin["engine_version"] == "0.1.0").all()
    assert (lin["wall_sec"] > 0).all()


def test_incremental_delta_matches_full_recompute(spark):
    """Split the turn table by time: backfill the early turns, apply
    the late turns as a delta, and require bit-identical vectors to a
    full backfill of everything — extended conversations refreshed,
    brand-new conversations added, untouched conversations' rows (and
    untouched buckets) preserved byte-for-byte."""
    from pyspark.sql import functions as F

    from pymfe_spark.operators.backfill import backfill_incremental

    out_full, out_inc = "/tmp/backfill_full", "/tmp/backfill_inc"
    _clean(out_full, out_inc)
    t = turns(spark, SF_SMOKE)
    ex = MFESpark(groups=("general",))

    # early = every conversation's first 60% of turns (some convs drop
    # out entirely -> the delta re-introduces them as brand-new)
    from pyspark.sql.window import Window

    w = Window.partitionBy("conv_id")
    frac = F.col("turn_idx") / F.max("turn_idx").over(w)
    early = t.withColumn("_f", frac).filter(F.col("_f") <= 0.6).drop("_f")
    late = t.withColumn("_f", frac).filter(F.col("_f") > 0.6).drop("_f")

    backfill(spark, t, out_full, n_buckets=4, extractor=ex)
    backfill(spark, early, out_inc, n_buckets=4, extractor=ex)
    s = backfill_incremental(
        spark, late, out_inc, delta_id="d1", n_buckets=4, extractor=ex
    )
    assert s["buckets_run"], "delta touched no bucket"

    a = (
        read_backfill(spark, out_full)
        .orderBy("conv_id")
        .toPandas()
        .reset_index(drop=True)
    )
    b = (
        read_backfill(spark, out_inc)
        .orderBy("conv_id")
        .toPandas()
        .reset_index(drop=True)
    )
    assert a.equals(b), "incremental result differs from full recompute"

    # replay idempotence: applying the same delta again is a no-op
    s2 = backfill_incremental(
        spark, late, out_inc, delta_id="d1", n_buckets=4, extractor=ex
    )
    assert s2["buckets_run"] == []
    assert s2["buckets_skipped"] == s["buckets_run"]
    _clean(out_full, out_inc)
