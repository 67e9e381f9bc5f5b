"""Arbitrary-table meta-feature extraction: numpy ground truth for the
reference semantics (e1071 method-3 moments, ddof=1, abs-tril cov/cor,
mean+sd attribute summary). Oracle parity is covered by
test_oracle_parity; this pins the VALUES against an independent
implementation."""

from __future__ import annotations

import numpy as np

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
