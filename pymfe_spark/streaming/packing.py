"""Streaming sequence packing — the always-on twin of
``operators/packing.py``: as curated documents arrive, each shard
assigns them token offsets and chunk ids by carrying ONE running
counter per shard in ``applyInPandasWithState``.

This is the genuinely order-dependent stateful operator the batch
window cannot express incrementally: chunk assignment depends on the
total tokens packed so far, so the state is the next free offset of
each shard's token stream — O(1) per shard, independent of history
length. Contract (documented, test-enforced): within a micro-batch
documents are packed in ``doc_id`` order; across micro-batches they
are packed in arrival order. When ingest ids are monotone w.r.t.
arrival — the production append-log case — the streamed assignment is
IDENTICAL to the batch ``pack_sequences`` plan over the final corpus
(pytest: multi-micro-batch stream == batch, bit-for-bit).

At scale the state store holds ``n_shards`` counters partitioned by
shard hash; arrivals for different shards never contend, and raising
``n_shards`` raises both packing parallelism and state-store spread.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

from pymfe_spark.operators.packing import PACK_BUDGET, PACK_SHARDS

DOC_SCHEMA = "doc_id long, text string"

STATE_SCHEMA = StructType(
    [
        StructField("next_offset", LongType()),
        StructField("n_docs", LongType()),
    ]
)

OUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("shard", LongType()),
        StructField("n_tokens", LongType()),
        StructField("start_offset", LongType()),
        StructField("chunk_first", LongType()),
        StructField("chunk_last", LongType()),
        StructField("n_chunks", LongType()),
    ]
)


def _n_tokens(text: pd.Series) -> pd.Series:
    # same semantics as the batch plan's filter(split(text, ' '), != ''):
    # split on single spaces, count non-empty segments
    return text.fillna("").map(
        lambda s: sum(1 for t in s.split(" ") if t)
    )


def _pack_shard(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (shard,) = key
    if state.exists:
        offset, n_docs = state.get
    else:
        offset, n_docs = 0, 0

    batch = pd.concat(list(pdfs), ignore_index=True)
    batch = batch.sort_values("doc_id", kind="mergesort")
    toks = _n_tokens(batch["text"]).to_numpy()
    keep = toks >= 1
    ids = batch["doc_id"].to_numpy()[keep]
    toks = toks[keep]

    starts = offset + toks.cumsum() - toks
    ends = starts + toks - 1
    offset = int(offset + toks.sum())
    n_docs += int(len(ids))
    state.update((offset, n_docs))

    yield pd.DataFrame(
        {
            "doc_id": ids,
            "shard": int(shard),
            "n_tokens": toks,
            "start_offset": starts,
            "chunk_first": starts // PACK_BUDGET,
            "chunk_last": ends // PACK_BUDGET,
            "n_chunks": ends // PACK_BUDGET - starts // PACK_BUDGET + 1,
        }
    )


def streaming_pack_sequences(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream(documents) -> groupBy(shard) ->
    applyInPandasWithState carrying each shard's next free token
    offset. Output mode append: every document's assignment is emitted
    exactly once, when it is packed."""
    reader = spark.readStream.schema(DOC_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)
    sharded = stream.withColumn("shard", F.col("doc_id") % PACK_SHARDS)
    return sharded.groupBy("shard").applyInPandasWithState(
        _pack_shard,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
