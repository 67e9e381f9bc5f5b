"""Structured Streaming surface: sessionized per-conversation stats.

The engine is batch-first (the north rule realizes no-late-leakage as
the as-of predicate in batch backfill — SURVEY.md §1.2), but the
session operator has a genuine streaming twin: ``session_window`` with
a watermark. Semantics match the batch sessionizer
(operators/temporal.py): a session closes when no turn arrives within
the gap. Watermark contract (verified batch-by-batch in tests): a
session stays open for merging until the watermark passes its end;
once finalized (emitted in append mode), later-arriving turns older
than the watermark are dropped — a closed session is never grown,
re-emitted, or shadowed by a late duplicate.

Used with ``Trigger.AvailableNow`` this doubles as incremental batch:
each invocation processes only new files — the streaming flavor of the
backfill's bucket resumability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def streaming_session_stats(
    spark: SparkSession,
    input_dir: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream over a transcript directory -> watermarked
    session-window aggregation. Returns the streaming DataFrame; caller
    attaches writeStream (tests use trigger(availableNow=True) +
    memory sink). ``max_files_per_trigger`` forces multiple
    micro-batches so watermark advancement between batches (late-data
    dropping) is exercised."""
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir).withWatermark("ts", watermark)
    return stream.groupBy(
        F.col("conv_id"), F.session_window("ts", gap)
    ).agg(
        F.count("*").alias("n_turns"),
        F.avg(F.length("text")).alias("mean_len"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


DOC_STREAM_SCHEMA = "doc_id long, text string, ts timestamp"


def streaming_dedup_exact(
    spark: SparkSession,
    input_dir: str,
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming exact dedup: readStream over a document directory ->
    normalize -> ``dropDuplicatesWithinWatermark`` on the normalized
    text. The first arrival of each distinct document is emitted; any
    replay within the watermark horizon is suppressed.

    The scale property that matters: state is keyed by norm and
    EXPIRES once the watermark passes — the dedup store is bounded by
    the horizon's document volume, not the corpus (an unbounded
    ``dropDuplicates`` would accrete 100 TB of keys). The batch twin
    (operators/dedup.py dedup_exact) dedups the full corpus offline;
    the streaming form guards the ingest front door, and the two
    compose: horizon dedup at ingest, global dedup in the nightly
    batch. Equivalence of the kept key set with the batch groupBy is
    asserted in tests across multi-micro-batch replays."""
    reader = spark.readStream.schema(DOC_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir).withWatermark("ts", watermark)
    return stream.withColumn(
        "norm", F.lower(F.trim(F.col("text")))
    ).dropDuplicatesWithinWatermark(["norm"])
