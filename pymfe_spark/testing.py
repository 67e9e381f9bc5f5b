"""Test-support utilities: DuckDB oracle comparison (the same check the
driver's correctness gate performs: column names + row count +
order-insensitive values)."""

from __future__ import annotations

import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duckdb_connect(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                pass
    return df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)


def assert_frames_match(spark_df: pd.DataFrame, duck_df: pd.DataFrame, name: str = "") -> None:
    assert sorted(spark_df.columns) == sorted(duck_df.columns), (
        f"{name}: columns differ: {sorted(spark_df.columns)} vs {sorted(duck_df.columns)}"
    )
    assert len(spark_df) == len(duck_df), (
        f"{name}: row counts differ: {len(spark_df)} vs {len(duck_df)}"
    )
    s, d = normalize(spark_df), normalize(duck_df)
    for c in s.columns:
        sv, dv = s[c], d[c]
        if pd.api.types.is_numeric_dtype(sv) and pd.api.types.is_numeric_dtype(dv):
            assert np.allclose(
                sv.astype(float), dv.astype(float), rtol=0, atol=1e-9, equal_nan=True
            ), f"{name}: column {c} numeric values differ"
        elif pd.api.types.is_datetime64_any_dtype(sv) or pd.api.types.is_datetime64_any_dtype(dv):
            assert (
                pd.to_datetime(sv).dt.tz_localize(None).astype("datetime64[us]")
                == pd.to_datetime(dv).dt.tz_localize(None).astype("datetime64[us]")
            ).all(), f"{name}: column {c} timestamps differ"
        else:
            assert (
                sv.fillna("·").astype(str) == dv.fillna("·").astype(str)
            ).all(), f"{name}: column {c} values differ"


# ---------------------------------------------------------------------
# planted mega-conversation fixture (round-4): ONE deterministic
# generator shared by the Spark catalog query (mfe_extract_hybrid_mega)
# and the driver-side golden twin (tools/freeze_goldens.py), so the
# hybrid tier's output on a REAL mega conversation is golden-gated.
# text_len / ts_delta_s are integer-valued doubles: their plain sums
# are exact in any association order (every partial sum < 2^53), which
# keeps the frozen comparison tight.
# ---------------------------------------------------------------------

MEGA_GOLDEN_CONV_ID = "zz_mega_golden"
MEGA_GOLDEN_TURNS = 200_000
_MEGA_T0_US = 1735689600_000_000  # 2025-01-01T00:00:00 UTC


def mega_conv_pandas(n_turns: int = MEGA_GOLDEN_TURNS) -> pd.DataFrame:
    """The planted mega conversation as a kernel-ready pandas frame
    (columns = operators.base.turns output). Pure integer recurrences —
    no RNG state, bit-identical everywhere."""
    i = np.arange(n_turns, dtype=np.int64)
    roles = np.array(["user", "assistant", "system"], dtype=object)
    tools = np.array([None, "search", "python", None, "exec"], dtype=object)
    text_len = (1 + (i * 2654435761) % 500).astype(float)
    delta = (1 + (i * 48271) % 120).astype(float)
    delta[0] = np.nan  # first turn of a conversation has no lag
    ts_us = _MEGA_T0_US + np.concatenate(
        ([0], np.cumsum(delta[1:]).astype(np.int64) * 1_000_000)
    )
    return pd.DataFrame(
        {
            "conv_id": MEGA_GOLDEN_CONV_ID,
            "turn_idx": i.astype(np.int32),
            "role": roles[i % 3],
            "tool": tools[i % 5],
            "ts": pd.to_datetime(ts_us, unit="us"),
            "text_len": text_len,
            "ts_delta_s": delta,
        }
    )


_MEGA_SCHEMA = (
    "conv_id string, turn_idx int, role string, tool string, "
    "ts timestamp_ntz, text_len double, ts_delta_s double"
)


def mega_conv_df(spark, n_turns: int = MEGA_GOLDEN_TURNS):
    """The same fixture as a Spark DataFrame with the exact turns()
    schema, ready to unionByName with a real turn table.

    Generated DISTRIBUTED: spark.range drives the partitioning and each
    task synthesizes only its own index span, so no fixture bytes ride
    in the task binary (the driver-built createDataFrame form shipped
    ~1.3 MB per task at 200k turns). The ts prefix sum has no closed
    form, so each task recomputes the delta cumsum from index 0 with
    the identical numpy ops as mega_conv_pandas — O(n_turns) vectorized
    work per task, microseconds at fixture scale, and bit-identical to
    the pandas twin (asserted by tests/test_hybrid.py)."""

    def gen(batches):
        full = None
        for pdf in batches:
            idx = pdf["id"].to_numpy(dtype=np.int64)
            if len(idx) == 0:
                continue
            if full is None or len(full) <= idx.max():
                full = mega_conv_pandas(n_turns)
            yield full.iloc[idx].reset_index(drop=True)

    n_parts = max(1, min(int(spark.sparkContext.defaultParallelism), n_turns // 25_000 or 1))
    rng = spark.range(0, n_turns, 1, n_parts)
    return rng.mapInPandas(gen, schema=_MEGA_SCHEMA)
