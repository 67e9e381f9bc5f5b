"""Streaming near-duplicate candidate detection — the always-on twin
of the batch banded-MinHash pipeline (operators/dedup.py
dedup_minhash_verified).

Shape: band keys are computed as a PURE PROJECTION on the stream
(``with_band_keys`` — stateless, so it composes with any watermark),
then ``applyInPandasWithState`` grouped by (band, bk) carries each
bucket's member list: a new arrival emits one candidate-pair row per
previously seen member of the bucket. Under monotone ingest the
distinct emitted pair set is IDENTICAL to the batch
``banded_candidate_pairs`` set for every sub-cap bucket (pytest,
multi-micro-batch).

Mega-bucket semantics necessarily differ from batch: the batch pass
sees final bucket sizes and drops hot buckets retroactively; a stream
cannot retract. Here a bucket saturates at ``max_band_bucket`` members
— pairs already emitted stand, later arrivals in a saturated bucket
emit nothing and are not remembered (state stays O(max_band_bucket)
per bucket, so total state is bounded by #buckets x cap regardless of
corpus size). Production composition mirrors exact dedup: LSH
screening at the ingest front door, global verified dedup in the
nightly batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from pymfe_spark.operators.dedup import MAX_BAND_BUCKET, with_band_keys

DOC_STREAM_SCHEMA = "doc_id long, text string, ts timestamp"

STATE_SCHEMA = StructType(
    [
        StructField("seen", ArrayType(LongType())),
        StructField("saturated", IntegerType()),
    ]
)

OUT_SCHEMA = StructType(
    [
        StructField("band", IntegerType()),
        StructField("bk", LongType()),
        StructField("doc_a", LongType()),
        StructField("doc_b", LongType()),
    ]
)


def _make_bucket_fn(max_band_bucket: int):
    def _bucket_pairs(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        band, bk = key
        if state.exists:
            seen_arr, saturated = state.get
            seen = list(seen_arr)
        else:
            seen, saturated = [], 0

        batch = pd.concat(list(pdfs), ignore_index=True)
        # deterministic within-batch order (across-batch = arrival order)
        ids = sorted(set(batch["doc_id"].tolist()) - set(seen))
        out_a, out_b = [], []
        for d in ids:
            if saturated or len(seen) >= max_band_bucket:
                saturated = 1
                continue
            for s in seen:
                lo, hi = (s, d) if s < d else (d, s)
                out_a.append(lo)
                out_b.append(hi)
            seen.append(d)
        state.update((seen, saturated))
        if out_a:
            yield pd.DataFrame(
                {
                    "band": band,
                    "bk": bk,
                    "doc_a": out_a,
                    "doc_b": out_b,
                }
            )

    return _bucket_pairs


def streaming_neardup_candidates(
    spark: SparkSession,
    input_dir: str,
    max_band_bucket: int = MAX_BAND_BUCKET,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream over a document directory -> banded MinHash keys
    (projection) -> per-bucket stateful pair emission. Output rows:
    ``(band, bk, doc_a, doc_b)`` — one per (bucket, new-pair) event;
    distinct (doc_a, doc_b) is the candidate set."""
    reader = spark.readStream.schema(DOC_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)
    bands = (
        with_band_keys(stream)
        .select("doc_id", F.explode("bands").alias("bv"))
        .select(
            "doc_id",
            F.col("bv.band").alias("band"),
            F.col("bv.bk").alias("bk"),
        )
    )
    return bands.groupBy("band", "bk").applyInPandasWithState(
        _make_bucket_fn(max_band_bucket),
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
