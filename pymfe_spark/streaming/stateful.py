"""Custom stateful streaming operator: incremental per-conversation
feature state via ``applyInPandasWithState``.

The batch engine recomputes a conversation's features from its full
prefix; the streaming twin keeps O(1) state per conversation (Welford
count/mean/M2 of text length + role counts) and folds each arriving
micro-batch in, so a conversation's feature row is always current
without re-reading history. This is the streaming analogue of the
algebraic (sum/mean/sd/entropy) subset of the measure registry —
exactly the decomposition the salted skew aggregation uses in batch
(operators/skew.py): state merge == partial-aggregate merge.

Output agrees with the batch aggregation (tested): n_turns, mean/sd of
text length, role entropy per conv.
"""

from __future__ import annotations

import json
import math
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)

STATE_SCHEMA = StructType(
    [
        StructField("n_turns", LongType()),  # all rows (count(*))
        StructField("n", LongType()),  # non-null text rows (length stats)
        StructField("mean", DoubleType()),
        StructField("m2", DoubleType()),
        StructField("role_json", StringType()),
    ]
)

OUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("n_turns", LongType()),
        StructField("mean_len", DoubleType()),
        StructField("sd_len", DoubleType()),
        StructField("role_ent", DoubleType()),
    ]
)


def _merge_welford(
    n1: int, mean1: float, m2_1: float, n2: int, mean2: float, m2_2: float
) -> tuple[int, float, float]:
    """Chan parallel-variance merge — identical to the batch partial
    aggregate combine, so streaming state == map-side combine state."""
    if n1 == 0:
        return n2, mean2, m2_2
    if n2 == 0:
        return n1, mean1, m2_1
    n = n1 + n2
    delta = mean2 - mean1
    mean = mean1 + delta * n2 / n
    m2 = m2_1 + m2_2 + delta * delta * n1 * n2 / n
    return n, mean, m2


def _update_conv(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.exists:
        n_turns, n, mean, m2, role_json = state.get
        roles: dict[str, int] = json.loads(role_json)
    else:
        n_turns, n, mean, m2, roles = 0, 0, 0.0, 0.0, {}

    for pdf in pdfs:
        n_turns += len(pdf)
        # null text is SKIPPED by the batch twin's avg(length(text));
        # astype(str) would count it as the 4-char literal "None"
        lens = pdf["text"].dropna().str.len().to_numpy(dtype=float)
        for r, c in pdf["role"].value_counts().items():
            roles[r] = roles.get(r, 0) + int(c)
        bn = int(lens.size)
        if bn == 0:
            continue
        bmean = float(lens.mean())
        bm2 = float(((lens - bmean) ** 2).sum())
        n, mean, m2 = _merge_welford(n, mean, m2, bn, bmean, bm2)

    state.update((n_turns, n, mean, m2, json.dumps(roles, sort_keys=True)))

    total = sum(roles.values())
    ent = -sum(
        (c / total) * math.log2(c / total) for c in roles.values() if c
    ) if total else float("nan")
    sd = math.sqrt(m2 / (n - 1)) if n > 1 else float("nan")
    yield pd.DataFrame(
        {
            "conv_id": [conv_id],
            "n_turns": [n_turns],
            "mean_len": [mean if n else float("nan")],
            "sd_len": [sd],
            "role_ent": [ent],
        }
    )


def streaming_incremental_features(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream -> groupBy(conv_id) -> applyInPandasWithState.

    ``max_files_per_trigger`` forces multiple micro-batches so the
    state-merge path (not just the cold insert) is exercised; at scale
    state lives in the state store, partitioned by conv_id hash —
    arrivals for different conversations never contend.
    """
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)
    return stream.groupBy("conv_id").applyInPandasWithState(
        _update_conv,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
