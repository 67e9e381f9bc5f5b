"""Relative landmarking + bootstrap CI semantics."""

from __future__ import annotations

import numpy as np
import pytest

from pymfe_spark.plans.postprocess import (
    add_relative_landmarking,
    bootstrap_rows,
    conv_seed,
    rankdata_avg,
)


def test_rankdata_average_ties():
    assert rankdata_avg(np.array([10.0, 20.0, 20.0, 30.0])).tolist() == [
        1.0,
        2.5,
        2.5,
        4.0,
    ]


def test_relative_ranks_per_suffix():
    rows = {
        "best_node.mean": 0.9,
        "one_nn.mean": 0.7,
        "naive_bayes.mean": 0.8,
        "best_node.sd": 0.1,
        "one_nn.sd": 0.3,
        "naive_bayes.sd": 0.2,
        "nr_inst": 50.0,  # non-landmarking: untouched
    }
    out = add_relative_landmarking(rows)
    assert out["one_nn.mean.relative"] == 1.0
    assert out["naive_bayes.mean.relative"] == 2.0
    assert out["best_node.mean.relative"] == 3.0
    assert out["best_node.sd.relative"] == 1.0
    assert "nr_inst.relative" not in out


def test_bootstrap_intervals_cover_and_determinism():
    rng = np.random.RandomState(3)
    data = (rng.normal(5.0, 1.0, size=200),)

    def compute(arrays):
        return {"mean": float(arrays[0].mean())}

    r1 = bootstrap_rows(compute, data, "conv_x", sample_num=64)
    r2 = bootstrap_rows(compute, data, "conv_x", sample_num=64)
    assert r1 == r2, "bootstrap must be deterministic per conv_id"
    est, lo, hi = r1["mean"]
    assert lo < est < hi
    assert hi - lo < 1.0  # se ~ 1/sqrt(200) -> CI width ~ 0.28
    r3 = bootstrap_rows(compute, data, "conv_y", sample_num=64)
    assert r3 != r1  # different conv -> different seed


def test_conv_seed_stability():
    assert conv_seed("c000001") == conv_seed("c000001")
    assert conv_seed("c000001") != conv_seed("c000002")


def test_extract_relative_and_confidence_e2e(spark):
    from pymfe_spark.operators.base import turns
    from pymfe_spark.plans.extractor import MFESpark
    from tests.conftest import SF_SMOKE

    t = turns(spark, SF_SMOKE).filter("conv_id <= 'c000002'")
    rel = MFESpark(groups=("relative",)).extract(t).toPandas()
    rel_names = [n for n in rel.mtf_name.unique() if n.endswith(".relative")]
    assert len(rel_names) == 14  # 7 landmarkers x 2 summaries
    # ranks within each conv and suffix form a permutation-ish set
    one = rel[rel.mtf_name.str.endswith(".mean.relative")]
    for _, grp in one.groupby("conv_id"):
        vals = grp["mtf_val"].dropna()
        if len(vals) == 7:
            assert vals.sum() == pytest.approx(28.0)  # 1+..+7

    ci = (
        MFESpark(groups=("general",))
        .extract_with_confidence(t, sample_num=16)
        .toPandas()
    )
    assert {"mtf_val", "ci_low", "ci_high"} <= set(ci.columns)
    ok = ci.dropna()
    assert ((ok.ci_low <= ok.mtf_val + 1e-9) & (ok.mtf_val <= ok.ci_high + 1e-9)).mean() > 0.9

    names = MFESpark(groups=("general",)).metafeature_names()
    assert "nr_inst" in names and "freq_class.mean" in names
