"""Resumable, bucketed feature backfill with per-partition lineage.

North-rule requirements implemented here:

- **bucket-partitioned staging**: the input is written ONCE into a
  ``bucket=<k>/`` parquet layout (deterministic crc32 bucket of
  conv_id — conversations are the atomic unit, and a conversation's
  turns must stay together for point-in-time correctness). Every
  per-bucket pass then reads a single partition directory: partition
  pruning makes each bucket's input scan 1/n_buckets of the table
  instead of a full re-scan per bucket (round-1 shape: ~3 full scans
  per bucket -> ~24x read amplification at n_buckets=8).
- **checkpointed resumability**: one commit per bucket
  (``bucket=<k>/`` directory + ``_SUCCESS`` marker from Spark's
  committer), staging included. A killed job restarts and skips every
  bucket whose commit marker exists — at most one bucket of work is
  repeated, and re-running a completed backfill is a no-op.
- **per-partition lineage + metrics**: each bucket commit appends a
  lineage row (bucket id, input rows, output rows, wall seconds,
  engine version) to ``_lineage/``. Both row counts come from ONE
  aggregation over the just-written (small) output — the feature
  vector carries the conversation's turn count, so input accounting
  costs no extra input scan.

In production this maps 1:1 onto Iceberg: bucket commit ->
``writeTo(tbl).overwritePartitions()`` snapshot; lineage row ->
snapshot summary properties; resume -> snapshot list scan; staging ->
a bucket(conv_id)-partitioned source table (at 100 TB the source
would already be stored bucketed, and the staging step disappears).
The sandbox has no catalog, so plain parquet directories + _SUCCESS
markers stand in (same idempotence contract).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pymfe_spark.plans.extractor import MFESpark, extract_at_final_turn

ENGINE_VERSION = "0.1.0"


def _bucket_of(col, n_buckets: int):
    """Deterministic bucket id for a conv_id (stable across runs and
    partitionings — uses crc32, not Spark's internal hash, so the
    assignment survives engine upgrades)."""
    return F.pmod(F.crc32(col.cast("binary")), F.lit(n_buckets)).cast("int")


def _stage_input(
    spark: SparkSession, turns_df: DataFrame, staging: str, n_buckets: int
) -> None:
    """One scan of the input -> bucket-partitioned parquet staging
    (skipped when already committed)."""
    if os.path.exists(os.path.join(staging, "_SUCCESS")):
        return
    (
        turns_df.withColumn("bucket", _bucket_of(F.col("conv_id"), n_buckets))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(staging)
    )


def backfill(
    spark: SparkSession,
    turns_df: DataFrame,
    output_dir: str,
    n_buckets: int = 8,
    extractor: MFESpark | None = None,
) -> dict:
    """Run (or resume) a bucketed backfill of per-conversation feature
    vectors into ``output_dir``. Returns a summary dict.

    Idempotent: completed buckets (``_SUCCESS`` present) are skipped,
    so killing the job at any point and re-invoking converges to the
    same output (verified by tests/test_backfill.py including a
    mid-run kill + bit-identical final output).
    """
    extractor = extractor or MFESpark(groups=("general", "statistical"))
    os.makedirs(output_dir, exist_ok=True)
    lineage_dir = os.path.join(output_dir, "_lineage")
    staging = os.path.join(output_dir, "_staged_input")
    _stage_input(spark, turns_df, staging, n_buckets)
    staged = spark.read.parquet(staging)

    done, ran = [], []
    t_start = time.time()
    for k in range(n_buckets):
        bucket_path = os.path.join(output_dir, f"bucket={k}")
        if os.path.exists(os.path.join(bucket_path, "_SUCCESS")):
            done.append(k)
            continue
        t0 = time.time()
        # partition-pruned: only staging/bucket=k is read
        part = staged.filter(F.col("bucket") == k).drop("bucket")
        vec = extract_at_final_turn(part, extractor)
        # map<> column -> sorted key/val arrays for a stable parquet
        # schema; n_turns rides along for lineage accounting
        out = vec.select(
            "conv_id",
            "ts",
            "n_turns",
            F.map_keys("features").alias("mtf_names"),
            F.map_values("features").alias("mtf_vals"),
        )
        out.write.mode("overwrite").parquet(bucket_path)
        # one aggregation over the small written output covers both
        # lineage counts — no second pass over the input
        stats = (
            spark.read.parquet(bucket_path)
            .agg(
                F.count("*").alias("out_rows"),
                F.sum("n_turns").alias("in_rows"),
            )
            .collect()[0]
        )
        lineage_row = [
            (
                k,
                int(stats["in_rows"] or 0),
                int(stats["out_rows"]),
                round(time.time() - t0, 3),
                ENGINE_VERSION,
            )
        ]
        spark.createDataFrame(
            lineage_row,
            "bucket int, input_rows long, output_rows long, "
            "wall_sec double, engine_version string",
        ).write.mode("append").parquet(lineage_dir)
        ran.append(k)
    return {
        "buckets_total": n_buckets,
        "buckets_skipped": done,
        "buckets_run": ran,
        "wall_sec": round(time.time() - t_start, 3),
        "output_dir": output_dir,
    }


def read_backfill(spark: SparkSession, output_dir: str) -> DataFrame:
    """Read the completed backfill back as (conv_id, ts, n_turns,
    names, vals)."""
    return spark.read.option("basePath", output_dir).parquet(
        os.path.join(output_dir, "bucket=*")
    )


def read_lineage(spark: SparkSession, output_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(output_dir, "_lineage"))
