"""Frozen-golden value gate for the 8 rows-only ``zz_mfe_extract_*``
queries (round-2 verdict "Next round" #3).

Each golden parquet under tests/goldens/ was computed ONCE by the
driver-side numpy twin (tools/freeze_goldens.py — DuckDB load, no
Spark partitioning / Arrow chunking / applyInPandas). Here the real
catalog query runs on Spark and must reproduce the frozen values
key-for-key — the same hash-strength comparison the driver gate
applies to the SQL-tier queries, so a regression in ANY measure column
of the long outputs now fails a test instead of hiding behind a
rows-only check. Regenerate with ``python tools/freeze_goldens.py``
only alongside an intentional semantic change.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from pymfe_spark.plans.catalog import load_catalog
from tests.conftest import SF_SMOKE

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
# zz_mfe_extract_hybrid shares zz_mfe_extract_core's golden: on data
# with no mega conversations the hybrid is bit-identical to extract()
GOLDEN_FILE = {"zz_mfe_extract_hybrid": "zz_mfe_extract_core"}
GOLDEN_QUERIES = (
    "zz_mfe_extract_core",
    "zz_mfe_extract_hybrid",
    "zz_mfe_extract_hybrid_mega",
    "zz_mfe_extract_distance",
    "zz_mfe_extract_model_based",
    "zz_mfe_extract_complexity",
    "zz_mfe_extract_relative",
    "zz_mfe_extract_full_summaries",
    "zz_mfe_extract_confidence",
    "zz_mfe_extract_expanding",
)

# the mega query's exact tier sums 200k floats through a salted
# two-level JVM aggregation — a different association order than the
# twin's numpy sum, so float reassociation (not drift) needs headroom;
# every other row in the frame still matches far tighter in practice
RTOL = {"zz_mfe_extract_hybrid_mega": 1e-9}

# Measures whose kernels route through LAPACK (eigh / svd / det /
# pinv): deterministic within one host but NOT across BLAS builds or
# CPU dispatch paths. Round-5 re-verification on a different
# microarchitecture measured up to 8.7e-10 relative drift in the
# can-cor family on a clean git tree — and the numpy twin itself,
# re-run on the new host (tools/freeze_goldens.py replay), reproduced
# the SAME six drifted values while every non-LAPACK value in all ten
# goldens stayed 1e-12-tight. So the Spark path remains bit-faithful
# to its twin; only the eigensolver's answer moved between hosts.
# 1e-7 keeps ~100x headroom over observed drift and is still four
# orders tighter than the reference's own test tolerance (rtol=0.05 /
# atol=1e-3, /root/reference/tests/test_statistical.py:213-215).
LAPACK_RTOL = 1e-7
LAPACK_MEASURES = frozenset(
    (
        "can_cor",  # eigen-CCA (eigh + svd)
        "eigenvalues",  # np.linalg.eigvalsh of cov
        "lh_trace",  # can-cor eigenvalue functionals
        "p_trace",
        "roy_root",
        "w_lambda",
        "sd_ratio",  # per-class/pooled covariance determinants
        "f1v",  # pinv-scatter direction (complexity)
        "t2",  # eigen-PCA 95%-variance dimensionality family
        "t3",
        "t4",
        "linear_discr",  # pooled-covariance pinv (landmarking)
    )
)


def _per_row_tol(name: str, frame: pd.DataFrame) -> np.ndarray:
    base = np.full(len(frame), RTOL.get(name, 1e-12))
    if "mtf_name" in frame.columns:
        fam = frame["mtf_name"].str.split(".").str[0]
        lapack = fam.isin(LAPACK_MEASURES).to_numpy()
        base = np.where(lapack, np.maximum(base, LAPACK_RTOL), base)
    return base

CATALOG = load_catalog()


def _keyed(df: pd.DataFrame) -> pd.DataFrame:
    keys = [c for c in ("conv_id", "turn_idx", "mtf_name") if c in df.columns]
    return df.sort_values(keys).reset_index(drop=True)


@pytest.mark.parametrize("name", GOLDEN_QUERIES)
def test_extract_output_matches_frozen_golden(spark, name):
    golden = pd.read_parquet(
        os.path.join(GOLDEN_DIR, f"{GOLDEN_FILE.get(name, name)}.parquet")
    )
    got = CATALOG[name].fn(spark, SF_SMOKE).toPandas()
    assert sorted(got.columns) == sorted(golden.columns), name
    assert len(got) == len(golden), (
        f"{name}: {len(got)} rows vs frozen {len(golden)}"
    )
    g, w = _keyed(got), _keyed(golden)
    for c in g.columns:
        if g[c].dtype == object:
            assert (g[c] == w[c]).all(), f"{name}: key column {c} differs"
        else:
            a = g[c].astype(float).to_numpy()
            b = w[c].astype(float).to_numpy()
            # the Spark path runs the SAME kernels on the SAME float64
            # inputs — tolerance only covers libm/LAPACK differences
            # across environments (and, for the mega query,
            # summation-order reassociation in the salted exact tier),
            # not real drift; LAPACK-backed rows get LAPACK_RTOL
            tol = _per_row_tol(name, w)
            # np.isclose rejects an array rtol when non-finite values
            # are present (it subsets x[finite] but not rtol), so the
            # |a-b| <= atol + rtol*|b| check is spelled out elementwise
            with np.errstate(invalid="ignore"):
                close = np.abs(a - b) <= tol * (1.0 + np.abs(b))
            bad = ~(close | (a == b) | (np.isnan(a) & np.isnan(b)))
            assert not bad.any(), (
                f"{name}: {bad.sum()} values differ in {c}; first at "
                f"{w.loc[np.argmax(bad), [k for k in ('conv_id', 'mtf_name') if k in w]].tolist()}: "
                f"{a[np.argmax(bad)]!r} vs frozen {b[np.argmax(bad)]!r}"
            )


# ---------------------------------------------------------------------
# Spark-iterative frozen goldens (round-4): the seed-fixed k-means
# pair has no numpy twin (iterative, driver-looped), so its own output
# was frozen once by tools/freeze_spark_goldens.py — ids compare
# exactly; scores at one-rounding-step tolerance because centroid
# means reassociate distributed float sums (~1e-16 perturbation that
# can flip the 4-dp rounding of a boundary value).
# ---------------------------------------------------------------------

SPARK_GOLDEN_QUERIES = ("zz_kmeans_assign", "zz_sim_kmeans_ivf_topk")


@pytest.mark.parametrize("name", SPARK_GOLDEN_QUERIES)
def test_kmeans_output_matches_frozen_golden(spark, name):
    golden = pd.read_parquet(os.path.join(GOLDEN_DIR, f"{name}.parquet"))
    got = CATALOG[name].fn(spark, SF_SMOKE).toPandas()
    assert sorted(got.columns) == sorted(golden.columns), name
    assert len(got) == len(golden), name
    keys = [c for c in ("query_id", "vec_id", "rk") if c in got.columns]
    g = got.sort_values(keys).reset_index(drop=True)
    w = golden.sort_values(keys).reset_index(drop=True)
    for c in g.columns:
        a, b = g[c].to_numpy(), w[c].to_numpy()
        if c in ("cos_to_centroid", "cos"):
            bad = ~np.isclose(
                a.astype(float), b.astype(float), rtol=0, atol=1.01e-4
            )
        else:
            bad = a != b
        assert not bad.any(), (
            f"{name}.{c}: {bad.sum()} mismatches, first at row "
            f"{int(np.argmax(bad))}: {a[np.argmax(bad)]!r} vs "
            f"{b[np.argmax(bad)]!r}"
        )
