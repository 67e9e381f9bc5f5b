"""Auxiliary introspection API + extract_from_model
(/root/reference/pymfe/mfe.py:1681-2087 analogues)."""

from __future__ import annotations

import numpy as np
import pytest

from pymfe_spark.plans.extractor import MFESpark, extract_from_model
from pymfe_spark.plans.measures import GROUPS
from pymfe_spark.plans.ml import NumpyCART


def test_valid_groups_and_summary():
    groups = MFESpark.valid_groups()
    assert set(groups) == {
        "general", "statistical", "info-theory", "clustering", "concept",
        "itemset", "landmarking", "model-based", "complexity", "relative",
    }
    summ = MFESpark.valid_summary()
    assert len(summ) == 32  # 16 sigma + nan* variants (_summary.py:447-482)
    assert "mean" in summ and "nankurtosis" in summ


def test_valid_metafeatures_counts():
    """Group cardinalities mirror the reference inventory (SURVEY.md
    section 2.3)."""
    counts = {
        "general": 11, "statistical": 29, "info-theory": 8,
        "clustering": 8, "concept": 4, "itemset": 2,
        "landmarking": 7, "model-based": 14, "complexity": 22,
    }
    for group, n in counts.items():
        assert len(MFESpark.valid_metafeatures((group,))) == n, group
    assert len(MFESpark.valid_metafeatures()) == sum(counts.values())
    with pytest.raises(ValueError):
        MFESpark.valid_metafeatures(("nope",))


def test_metafeature_description():
    desc = MFESpark.metafeature_description(("complexity",))
    assert len(desc) == 22
    group, doc = desc["t1"]
    assert group == "complexity" and "hypersphere" in doc.lower()


def test_extract_from_model():
    """Tree-shape features from a fitted model, no data
    (mfe.py:1681-1814)."""
    rng = np.random.RandomState(0)
    X = rng.randn(100, 3)
    y = np.where(X[:, 0] > 0, "a", "b").astype(object)
    rows = extract_from_model(NumpyCART().fit(X, y))
    assert rows["leaves"] == 2.0  # single perfect split
    assert rows["nodes"] == 1.0
    assert rows["tree_depth.mean"] == pytest.approx(2 / 3)
    assert all(k.split(".")[0] in GROUPS["model-based"] for k in rows)
    with pytest.raises(ValueError):
        extract_from_model(NumpyCART())  # unfitted
