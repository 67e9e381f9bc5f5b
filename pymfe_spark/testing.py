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
