"""MFESpark — the Arrow-tier meta-feature extractor.

The engine analogue of the reference's ``MFE(...).fit(X, y).extract()``
lifecycle (/root/reference/pymfe/mfe.py:904-1397), inverted for scale:
instead of one in-memory matrix per fit, thousands of conversations are
extracted in parallel — one Arrow batch per ``conv_id`` through
``groupBy(conv_id).applyInPandas`` (zero per-row Python; input_hint
mandate).

Physical plan:
    scan -> derive turn features (single conv window)
         -> hash exchange on conv_id (AQE-coalesced)
         -> sort within partitions (turn_idx)
         -> Arrow kernel (numpy measure registry + summary sigma)
         -> long rows (conv_id, mtf_name, mtf_val)

Scale levers (100 TB design):
- a conversation is the atomic work unit; partition count follows
  ``spark.sql.shuffle.partitions``; AQE splits skewed post-shuffle
  partitions across executors (mega-conv *groups* can't be split —
  see ``max_kernel_turns``).
- ``max_kernel_turns`` caps the O(n²) distance-based groups per
  conversation (clustering/concept), mirroring the reference's own
  sampling caps (lm_sample_frac mfe.py:199-201, attr_conc 12-column cap
  info_theory.py:219-263, normality 5000-row cap statistical.py:970).
  Prefix (not random) slice keeps point-in-time semantics.
- measure failure -> NaN, never task failure (_internal.py:568-621).
"""

from __future__ import annotations

import warnings
from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pymfe_spark.functions.summary import DEFAULT_SUMMARIES, summarize
from pymfe_spark.plans.measures import ALL_GROUPS, GROUPS, MEASURES, ConvBatch

HEAVY_GROUPS = {"clustering", "concept"}  # O(n^2) distance matrices

OUT_SCHEMA = "conv_id string, mtf_name string, mtf_val double"


def _equal_freq_bins(v: np.ndarray) -> np.ndarray:
    """Equal-frequency discretization into floor(n^(1/3)) bins via
    quantile cuts + digitize (/root/reference/pymfe/_internal.py:
    1550-1624)."""
    n = v.size
    k = max(int(np.floor(n ** (1.0 / 3.0) + 1e-9)), 1)
    if k <= 1:
        return np.zeros(n, dtype=np.int64)
    cuts = np.quantile(v, np.arange(1, k) / k)
    return np.digitize(v, cuts)


def build_batch(pdf: pd.DataFrame) -> ConvBatch:
    """Assemble N / C / y views from one conversation's turns."""
    pdf = pdf.sort_values("turn_idx")
    text_len = pdf["text_len"].to_numpy(dtype=float)
    ts_delta = pdf["ts_delta_s"].fillna(0.0).to_numpy(dtype=float)
    turn_idx = pdf["turn_idx"].to_numpy(dtype=float)
    N = np.column_stack([text_len, ts_delta, turn_idx])
    role = pdf["role"].to_numpy(dtype=object)
    tool0 = pdf["tool"].fillna("NONE").to_numpy(dtype=object)
    len_bin = _equal_freq_bins(text_len).astype(object)
    C = np.column_stack([role, tool0, len_bin])
    return ConvBatch(N=N, C=C, y=role)


def extract_batch(
    pdf: pd.DataFrame,
    measure_names: Iterable[str],
    summaries: tuple[str, ...],
    max_kernel_turns: int,
) -> pd.DataFrame:
    """Run the selected measures over one conversation batch."""
    conv_id = pdf["conv_id"].iloc[0]
    batch = build_batch(pdf)
    capped: ConvBatch | None = None
    rows: dict[str, float] = {}
    for name in measure_names:
        mdef = MEASURES[name]
        b = batch
        if mdef.group in HEAVY_GROUPS and batch.N.shape[0] > max_kernel_turns:
            if capped is None:
                capped = build_batch(pdf.iloc[:max_kernel_turns])
            b = capped
        try:
            # degenerate batches (single turn, constant columns) yield
            # NaN, not warnings/task failures (_internal.py:568-621)
            with np.errstate(all="ignore"), warnings.catch_warnings():
                warnings.simplefilter("ignore", RuntimeWarning)
                val = mdef.fn(b)
        except Exception:
            val = float("nan")
        rows.update(summarize(name, val, summaries))
    names = sorted(rows)  # deterministic output order (mfe.py:1340-1346)
    return pd.DataFrame(
        {
            "conv_id": conv_id,
            "mtf_name": names,
            "mtf_val": [rows[n] for n in names],
        }
    )


class MFESpark:
    """Distributed meta-feature extractor over transcript tables.

    >>> MFESpark(groups=("general", "statistical")).extract(turns_df)
    DataFrame[conv_id, mtf_name, mtf_val]   # long format

    ``groups`` mirrors the reference's group selection (mfe.py:55-353 /
    VALID_GROUPS _internal.py:103-114); ``summaries`` the sigma set
    (process_summary _internal.py:961-1034).
    """

    def __init__(
        self,
        groups: tuple[str, ...] = ALL_GROUPS,
        summaries: tuple[str, ...] = DEFAULT_SUMMARIES,
        max_kernel_turns: int = 4096,
    ) -> None:
        unknown = set(groups) - set(GROUPS)
        if unknown:
            raise ValueError(f"unknown groups: {sorted(unknown)}")
        self.groups = tuple(groups)
        self.summaries = tuple(summaries)
        self.max_kernel_turns = max_kernel_turns
        self.measure_names = tuple(
            name for g in self.groups for name in sorted(GROUPS[g])
        )

    def extract(self, turns_df: DataFrame) -> DataFrame:
        """turns_df needs columns: conv_id, turn_idx, role, tool,
        text_len, ts_delta_s (see operators.base.turns)."""
        measure_names = self.measure_names
        summaries = self.summaries
        cap = self.max_kernel_turns

        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            return extract_batch(pdf, measure_names, summaries, cap)

        cols = ["conv_id", "turn_idx", "role", "tool", "text_len", "ts_delta_s"]
        return (
            turns_df.select(*cols)
            .groupBy("conv_id")
            .applyInPandas(kernel, schema=OUT_SCHEMA)
        )

    def extract_wide(self, turns_df: DataFrame) -> DataFrame:
        """Wide variant: one row per conv_id with a map<name, value> —
        the Iceberg-friendly backfill row shape (SURVEY.md §1.2)."""
        long_df = self.extract(turns_df)
        return long_df.groupBy("conv_id").agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("mtf_name", "mtf_val")))
            ).alias("features")
        )


def extract_at_final_turn(
    turns_df: DataFrame, extractor: MFESpark | None = None
) -> DataFrame:
    """Backfill row per (conv_id, ts=last turn): attach the conversation's
    final ts to the wide vector (the north_star output unit)."""
    extractor = extractor or MFESpark()
    wide = extractor.extract_wide(turns_df)
    final_ts = turns_df.groupBy("conv_id").agg(F.max("ts").alias("ts"))
    return wide.join(final_ts, "conv_id")
