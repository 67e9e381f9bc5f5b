"""Temporal-correctness invariants (north rule):

1. Zero temporal leakage: point-in-time features computed on the full
   table must be identical to features computed on any ts-truncated
   prefix (FIXTURES.md 'Expected-output conventions').
2. As-of never reads the future: snapshots after a turn's ts are
   invisible; conversations without snapshots get null.
3. Stable turn ordering: per-turn text equality under (conv_id,
   turn_idx) ordering (input_hint invariant).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pymfe_spark.operators.asof import asof_join, asof_join_broadcast
from pymfe_spark.operators.temporal import expanding_pit, sessionized
from pymfe_spark.sources import synthetic_transcripts, transcripts
from tests.conftest import SF_SMOKE


def test_expanding_no_leakage(spark):
    """Truncate each conversation to its first 10 turns; expanding
    features for the surviving turns must be bit-identical."""
    full = expanding_pit(spark, SF_SMOKE).filter(F.col("turn_idx") < 10)
    t = transcripts(spark, SF_SMOKE).filter(F.col("turn_idx") < 10)

    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pre = t.select(
        "conv_id",
        "turn_idx",
        F.length("text").cast("double").alias("text_len"),
        "tool",
    ).select(
        "conv_id",
        "turn_idx",
        F.count("*").over(w).alias("cum_n"),
        F.round(F.avg("text_len").over(w), 6).alias("cum_mean_len"),
        F.round(F.stddev_samp("text_len").over(w), 6).alias("cum_sd_len"),
        F.round(F.max("text_len").over(w), 6).alias("cum_max_len"),
        F.round(
            F.sum(F.when(F.col("tool").isNotNull(), 1).otherwise(0)).over(w)
            / F.count("*").over(w),
            6,
        ).alias("cum_tool_rate"),
    )
    a = full.orderBy("conv_id", "turn_idx").toPandas()
    b = pre.orderBy("conv_id", "turn_idx").toPandas()
    assert a.equals(b), "expanding features leak future turns"


def test_asof_never_reads_future(spark):
    """Synthetic edge cases: snapshot strictly after every turn must not
    be picked; conv without snapshots -> null; snapshot exactly at ts IS
    picked (<=)."""
    t = spark.createDataFrame(
        [
            ("a", 0, "2025-01-01 00:00:00"),
            ("a", 1, "2025-01-01 00:10:00"),
            ("b", 0, "2025-01-01 00:00:00"),
            ("c", 0, "2025-01-01 00:05:00"),
        ],
        "conv_id string, turn_idx int, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    s = spark.createDataFrame(
        [
            ("a", "2025-01-01 00:10:00", 1.0),  # exactly at a/turn1
            ("a", "2025-01-01 00:20:00", 2.0),  # future for all a turns
            ("c", "2025-01-01 00:06:00", 9.0),  # strictly future
        ],
        "conv_id string, snap_ts string, ref_value double",
    ).withColumn("snap_ts", F.to_timestamp("snap_ts"))

    for impl in (asof_join, asof_join_broadcast):
        if impl is asof_join:
            out = impl(t, s).orderBy("conv_id", "turn_idx").collect()
        else:
            out = (
                asof_join_broadcast(t, s)
                .orderBy("conv_id", "turn_idx")
                .collect()
            )
        vals = [(r["conv_id"], r["turn_idx"], r["ref_value"]) for r in out]
        assert vals == [
            ("a", 0, None),  # only future snapshots
            ("a", 1, 1.0),  # snap exactly at ts is visible
            ("b", 0, None),  # no snapshots at all
            ("c", 0, None),  # snapshot 1 min in the future — invisible
        ], f"{impl.__name__} leaked future snapshots: {vals}"


def test_stable_turn_ordering_text_equality(spark, duck):
    """input_hint invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering, Spark vs DuckDB."""
    sp = (
        transcripts(spark, SF_SMOKE)
        .orderBy("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "text")
        .toPandas()
    )
    from pymfe_spark.sources import TRANSCRIPTS_SQL

    dk = duck.execute(
        f"SELECT conv_id, turn_idx, text FROM ({TRANSCRIPTS_SQL}) ORDER BY conv_id, turn_idx"
    ).df()
    assert (sp["text"] == dk["text"]).all()
    assert (sp["turn_idx"] == dk["turn_idx"]).all()


def test_sessionization_splits_on_gap(spark):
    """Synthetic generator plants a >gap break every 11th turn; session
    ids must be monotone, start at 1, and increase exactly at breaks."""
    syn = synthetic_transcripts(spark, n_convs=5, max_turns=30)
    syn.createOrReplaceTempView("events_unused")  # not used; direct path below

    from pyspark.sql.window import Window

    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = syn.withColumn(
        "ts_delta_s", (us - F.lag(us).over(w)).cast("double") / 1e6
    )
    sess = t.withColumn(
        "session_id",
        F.sum(
            F.when(
                F.col("ts_delta_s").isNull() | (F.col("ts_delta_s") > 1800.0), 1
            ).otherwise(0)
        )
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("int"),
    )
    pdf = sess.orderBy("conv_id", "turn_idx").toPandas()
    for conv, grp in pdf.groupby("conv_id"):
        sid = grp["session_id"].to_numpy()
        assert sid[0] == 1
        assert ((sid[1:] - sid[:-1]) >= 0).all()
        breaks = (grp["ts_delta_s"] > 1800.0).to_numpy()[1:]
        jumps = (sid[1:] - sid[:-1]) == 1
        assert (breaks == jumps).all(), f"conv {conv} session breaks wrong"
