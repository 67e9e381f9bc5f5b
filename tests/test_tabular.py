"""Arbitrary-table meta-feature extraction: numpy ground truth for the
reference semantics (e1071 method-3 moments, ddof=1, abs-tril cov/cor,
mean+sd attribute summary). Oracle parity is covered by
test_oracle_parity; this pins the VALUES against an independent
implementation."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from pymfe_spark.operators.tabular import NUM_COLS, mfe_tabular_lineitem
from tests.conftest import SF_SMOKE


def _truth(X: np.ndarray) -> dict[str, float]:
    n, k = X.shape
    mu = X.mean(axis=0)
    d = X - mu
    m2 = (d**2).mean(axis=0)
    m3 = (d**3).mean(axis=0)
    m4 = (d**4).mean(axis=0)
    sd = np.sqrt(m2 * n / (n - 1))
    skew = m3 / m2**1.5 * ((n - 1) / n) ** 1.5
    kurt = (m4 / m2**2) * (1 - 1 / n) ** 2 - 3
    C = np.cov(X, rowvar=False, ddof=1)
    R = np.corrcoef(X, rowvar=False)
    tril = np.tril_indices(k, k=-1)
    covs = np.abs(C[tril])
    cors = np.abs(R[tril])
    out = {}
    for name, vals in (
        ("mean", mu),
        ("sd", sd),
        ("skewness", skew),
        ("kurtosis", kurt),
        ("cov", covs),
        ("cor", cors),
    ):
        out[f"{name}.mean"] = float(np.mean(vals))
        out[f"{name}.sd"] = float(np.std(vals, ddof=1))
    out["nr_inst"] = float(n)
    out["nr_attr"] = float(k)
    out["attr_to_inst"] = k / n
    out["inst_to_attr"] = n / k
    return out


def test_tabular_mfe_matches_numpy_truth(spark):
    got = (
        mfe_tabular_lineitem(spark, SF_SMOKE)
        .toPandas()
        .set_index("mtf_name")["mtf_val"]
        .to_dict()
    )
    import pandas as pd

    X = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")[
        list(NUM_COLS)
    ].to_numpy(dtype=float)
    want = _truth(X)
    assert set(got) == set(want)
    for name, w in want.items():
        # engine rounds at 4; allow the rounding plus float slack
        assert abs(got[name] - w) < 1.5e-4, (name, got[name], w)


def test_grouped_extraction_equals_filtered_ungrouped(spark):
    """Per-group meta-features must equal running the ungrouped
    extractor on that group's filtered rows — every group IS a
    dataset."""
    from pymfe_spark.operators.tabular import mfe_tabular

    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").select(
        "l_returnflag", *NUM_COLS
    )
    grouped = (
        mfe_tabular(li, by="l_returnflag")
        .toPandas()
        .set_index(["l_returnflag", "mtf_name"])["mtf_val"]
    )
    flags = sorted(grouped.index.get_level_values(0).unique())
    assert len(flags) >= 2
    for flag in flags:
        solo = (
            mfe_tabular(li.filter(F.col("l_returnflag") == flag).drop("l_returnflag"))
            .toPandas()
            .set_index("mtf_name")["mtf_val"]
        )
        for name, v in solo.items():
            assert abs(grouped.loc[(flag, name)] - v) < 2e-4, (flag, name)
