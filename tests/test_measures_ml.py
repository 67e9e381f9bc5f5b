"""Goldens + invariants for the model-dependent groups (landmarking /
model-based / complexity) and the numpy ML primitives."""

from __future__ import annotations

import numpy as np
import pytest

from pymfe_spark.plans.measures import MEASURES, ConvBatch
from pymfe_spark.plans.measures import all_groups
from pymfe_spark.plans.ml import (
    NumpyCART,
    gnb_fit_predict,
    gower_norm_dist,
    lda_fit_predict,
    minimum_spanning_tree_edges,
    one_nn_fit_predict,
    stratified_kfold,
)

all_groups()  # register ML measures

RNG = np.random.RandomState(7)


def separable_batch(n_per=30, gap=10.0) -> ConvBatch:
    a = RNG.normal(0, 0.5, size=(n_per, 3))
    b = RNG.normal(gap, 0.5, size=(n_per, 3))
    N = np.vstack([a, b])
    y = np.array(["a"] * n_per + ["b"] * n_per, dtype=object)
    return ConvBatch(N=N, C=np.column_stack([y]), y=y)


def overlapping_batch(n_per=30) -> ConvBatch:
    N = RNG.normal(0, 1.0, size=(2 * n_per, 3))
    y = np.array(["a", "b"] * n_per, dtype=object)
    return ConvBatch(N=N, C=np.column_stack([y]), y=y)


# --- ml primitives -----------------------------------------------------


def test_stratified_kfold_partitions_and_stratification():
    y = np.array(["a"] * 40 + ["b"] * 20, dtype=object)
    seen = []
    for tr, te in stratified_kfold(y, 10):
        assert np.intersect1d(tr, te).size == 0
        seen.extend(te.tolist())
        # each fold has ~4 a's and ~2 b's
        assert 3 <= np.sum(y[te] == "a") <= 5
        assert 1 <= np.sum(y[te] == "b") <= 3
    assert sorted(seen) == list(range(60))
    with pytest.raises(ValueError):
        list(stratified_kfold(np.array(["a"] * 30 + ["b"] * 3), 10))


def test_cart_fits_xor():
    """CART must carve XOR perfectly (depth >= 2)."""
    X = np.array([[0, 0], [0, 1], [1, 0], [1, 1]] * 10, dtype=float)
    y = np.array(
        [a != b for a, b in X.astype(int)], dtype=object
    )
    t = NumpyCART().fit(X, y)
    assert (t.predict(X) == y).all()
    assert t.n_leaves >= 4
    imp = t.feature_importances_
    assert imp.sum() == pytest.approx(1.0)


def test_classifiers_separate_easy_data():
    b = separable_batch()
    Xtr, ytr = b.N[::2], b.y[::2]
    Xte, yte = b.N[1::2], b.y[1::2]
    for fp in (lda_fit_predict, gnb_fit_predict, one_nn_fit_predict):
        assert (fp(Xtr, ytr, Xte) == yte).mean() == 1.0


def test_mst_edge_count_and_gower_range():
    b = separable_batch(n_per=10)
    D = gower_norm_dist(b.N)
    assert D.min() >= 0 and D.max() <= 1.0
    assert np.allclose(D, D.T)
    edges = minimum_spanning_tree_edges(D)
    assert len(edges) == b.N.shape[0] - 1


# --- landmarking -------------------------------------------------------


def test_landmarkers_high_on_separable_low_on_noise():
    sep, ovl = separable_batch(), overlapping_batch()
    for name in ("best_node", "linear_discr", "naive_bayes", "one_nn", "elite_nn"):
        scores_sep = MEASURES[name].fn(sep)
        scores_ovl = MEASURES[name].fn(ovl)
        assert scores_sep.shape == (10,)
        assert scores_sep.mean() > 0.95, f"{name} weak on separable data"
        assert scores_ovl.mean() < 0.75, f"{name} suspicious on noise"


def test_landmarking_nan_when_class_too_rare():
    """Rarest class < n_folds -> ValueError (contained to NaN by the
    extractor), mirroring sklearn StratifiedKFold."""
    N = RNG.normal(size=(20, 2))
    y = np.array(["a"] * 17 + ["b"] * 3, dtype=object)
    b = ConvBatch(N=N, C=np.column_stack([y]), y=y)
    with pytest.raises(ValueError):
        MEASURES["best_node"].fn(b)


# --- model-based -------------------------------------------------------


def test_model_based_invariants():
    b = separable_batch()
    leaves = MEASURES["leaves"].fn(b)
    nodes = MEASURES["nodes"].fn(b)
    assert leaves >= 2 and nodes >= 1
    assert leaves == nodes + 1  # binary tree identity
    lb = MEASURES["leaves_branch"].fn(b)
    assert lb.shape == (int(leaves),)
    corrob = MEASURES["leaves_corrob"].fn(b)
    assert corrob.sum() == pytest.approx(1.0)
    lpc = MEASURES["leaves_per_class"].fn(b)
    assert lpc.sum() == pytest.approx(1.0)
    vi = MEASURES["var_importance"].fn(b)
    assert vi.shape == (3,) and vi.sum() == pytest.approx(1.0)
    npl = MEASURES["nodes_per_level"].fn(b)
    assert npl.sum() == nodes


# --- complexity --------------------------------------------------------


def test_complexity_easy_vs_hard():
    sep, ovl = separable_batch(), overlapping_batch()
    # f1/f3 near 0 easy, near 1 hard; n1/n3 low easy high hard
    assert MEASURES["f1"].fn(sep).min() < 0.1
    assert MEASURES["f1"].fn(ovl).min() > 0.5
    assert MEASURES["f3"].fn(sep)[0] < 0.1
    assert MEASURES["f3"].fn(ovl)[0] > 0.5
    assert MEASURES["n1"].fn(sep) < 0.15
    assert MEASURES["n1"].fn(ovl) > 0.4
    assert MEASURES["n3"].fn(sep).mean() < 0.05
    assert MEASURES["n3"].fn(ovl).mean() > 0.3
    # f2 overlap volume: zero for disjoint boxes
    assert MEASURES["f2"].fn(sep)[0] == pytest.approx(0.0)
    # f4: separable -> all examples removed
    assert MEASURES["f4"].fn(sep)[0] == pytest.approx(0.0)
    # balance measures on 50/50: c1 = 1, c2 = 0
    assert MEASURES["c1"].fn(sep) == pytest.approx(1.0)
    assert MEASURES["c2"].fn(sep) == pytest.approx(0.0)
    # dimensionality
    assert MEASURES["t2"].fn(sep) == pytest.approx(3 / 60)
    assert 1 <= MEASURES["t3"].fn(sep) * 60 <= 3
    assert MEASURES["lsc"].fn(sep) <= 1.0
