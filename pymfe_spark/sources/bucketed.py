"""Bucketed (co-located) tables — the shuffle-free join path at scale.

A join between two tables ``bucketBy(n, key)`` on the same key with the
same bucket count executes as a SortMergeJoin with ZERO exchange on
either side: each task reads bucket *i* of both tables, so the join is
pre-co-located on disk. At 100 TB this is the difference between
re-shuffling the full corpus on every join against per-document state
(embeddings, quality scores, dedup verdicts) and never shuffling it at
all — bucket layout is paid ONCE at ingest and amortized over every
downstream join. ``sortBy(key)`` additionally removes the per-task sort
from the SMJ.

The reference has no storage layer at all (SURVEY.md §1.1 — everything
is an in-memory numpy matrix); this module is pure engine-side scale
surface, the batch analogue of Iceberg bucket partition transforms.

Guarded by tests/test_bucketed.py: the joined plan must contain no
Exchange operator and must equal the plain (shuffled) join's result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    sorted_buckets: bool = True,
) -> None:
    """Persist ``df`` as a parquet table bucketed (and bucket-sorted)
    on ``key``. Idempotent overwrite — re-ingest replaces the layout."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sorted_buckets:
        w = w.sortBy(key)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket counts Spark plans SortMergeJoin with no Exchange (and no
    Sort when both sides are bucket-sorted)."""
    return spark.table(left_table).join(spark.table(right_table), key)
