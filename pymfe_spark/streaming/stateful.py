"""Custom stateful streaming operator: incremental per-conversation
feature state via ``applyInPandasWithState``.

The batch engine recomputes a conversation's features from its full
prefix; the streaming twin keeps O(1) state per conversation and folds
each arriving micro-batch in, so a conversation's feature row is
always current without re-reading history. The state is the algebraic
sufficient statistic of the measure vector — exact raw power sums
S1..S4 of text length (exact integers in double at these scales),
running min/max, and role counts — i.e. exactly the quantities the
batch stride-1 SQL vector (operators/temporal.py expanding_mfe_sql)
derives per prefix, and the same decomposition the salted skew
aggregation uses (operators/skew.py): state merge == partial-aggregate
merge, so multi-micro-batch arrival order cannot change any output.

Emitted per update: n_turns, mean/sd/min/max/range and e1071
method-3 skewness/kurtosis of text length (_summary.py:146-270
formulas, identical float op order to the batch SQL), role entropy,
and the distinct-role count. Agreement with the batch aggregation is
pytest-verified (streaming final state == batch query, multi-batch).
"""

from __future__ import annotations

import json
import math
from collections.abc import Iterator

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
        StructField("s1", DoubleType()),  # exact integer power sums
        StructField("s2", DoubleType()),
        StructField("s3", DoubleType()),
        StructField("s4", DoubleType()),
        StructField("mn", DoubleType()),
        StructField("mx", DoubleType()),
        StructField("role_json", StringType()),
    ]
)

OUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("n_turns", LongType()),
        StructField("nr_class", LongType()),
        StructField("mean_len", DoubleType()),
        StructField("sd_len", DoubleType()),
        StructField("min_len", DoubleType()),
        StructField("max_len", DoubleType()),
        StructField("range_len", DoubleType()),
        StructField("skewness_len", DoubleType()),
        StructField("kurtosis_len", DoubleType()),
        StructField("role_ent", DoubleType()),
    ]
)

_NAN = float("nan")


def _merge_welford(
    n1: int, mean1: float, m2_1: float, n2: int, mean2: float, m2_2: float
) -> tuple[int, float, float]:
    """Chan parallel-variance merge — the canonical stateful-merge
    identity (streaming state merge == batch partial-aggregate
    combine), property-tested in tests/test_properties.py. The
    operator itself now carries exact power sums instead (their merge
    is plain addition and exactly order-independent), but the Welford
    form remains the right tool when values are large enough that raw
    power sums lose integer exactness."""
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
        n_turns, n, s1, s2, s3, s4, mn, mx, role_json = state.get
        roles: dict[str, int] = json.loads(role_json)
    else:
        n_turns, n = 0, 0
        s1 = s2 = s3 = s4 = 0.0
        mn, mx = math.inf, -math.inf
        roles = {}

    for pdf in pdfs:
        n_turns += len(pdf)
        for r, c in pdf["role"].value_counts().items():
            roles[r] = roles.get(r, 0) + int(c)
        # null text is SKIPPED by the batch twin's avg(length(text));
        # astype(str) would count it as the 4-char literal "None"
        lens = pdf["text"].dropna().str.len().to_numpy(dtype=float)
        if lens.size == 0:
            continue
        n += int(lens.size)
        # power sums are exact integers in double -> the merge is
        # exactly commutative/associative; arrival order cannot
        # perturb any emitted value
        s1 += float(lens.sum())
        s2 += float((lens**2).sum())
        s3 += float((lens**3).sum())
        s4 += float((lens**4).sum())
        mn = min(mn, float(lens.min()))
        mx = max(mx, float(lens.max()))

    state.update(
        (
            n_turns, n, s1, s2, s3, s4, mn, mx,
            json.dumps(roles, sort_keys=True),
        )
    )

    # identical float op order to expanding_mfe_sql / the e1071
    # method-3 formulas (_summary.py:146-270), sqrt not pow
    if n > 0:
        mean = s1 / n
        sd = math.sqrt((s2 - s1 * s1 / n) / (n - 1)) if n > 1 else _NAN
        mu = s1 / n
        m2 = s2 / n - mu * mu
        if n >= 2 and m2 > 0:
            m3 = s3 / n - 3 * mu * (s2 / n) + 2 * mu * mu * mu
            m4 = (
                s4 / n
                - 4 * mu * (s3 / n)
                + 6 * mu * mu * (s2 / n)
                - 3 * mu * mu * mu * mu
            )
            q = (n - 1) / n
            skew = m3 / (m2 * math.sqrt(m2)) * (q * math.sqrt(q))
            kurt = m4 / (m2 * m2) * (q * q) - 3
        else:
            skew = kurt = _NAN
        out_mn, out_mx, rng = mn, mx, mx - mn
    else:
        mean = sd = skew = kurt = out_mn = out_mx = rng = _NAN

    total = sum(roles.values())
    ent = (
        math.log2(total) - sum(sorted(c * math.log2(c) for c in roles.values())) / total
        if total
        else _NAN
    )
    yield pd.DataFrame(
        {
            "conv_id": [conv_id],
            "n_turns": [n_turns],
            "nr_class": [len(roles)],
            "mean_len": [mean],
            "sd_len": [sd],
            "min_len": [out_mn],
            "max_len": [out_mx],
            "range_len": [rng],
            "skewness_len": [skew],
            "kurtosis_len": [kurt],
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
