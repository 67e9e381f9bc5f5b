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


def test_complexity_linearity_and_interpolation():
    """l1/l2/l3 near 0 on linearly separable data, clearly positive on
    label-noise data; n4 likewise (complexity.py:1183-1541,1830-1965)."""
    sep, ovl = separable_batch(), overlapping_batch()
    for name in ["l1", "l2", "l3"]:
        assert MEASURES[name].fn(sep).max() < 0.05, name
        assert MEASURES[name].fn(ovl).min() > 0.15, name
    assert MEASURES["n4"].fn(sep).mean() < 0.05
    assert MEASURES["n4"].fn(ovl).mean() > 0.25
    # determinism: seeded interpolation must reproduce exactly
    a = MEASURES["l3"].fn(overlapping_batch())
    b = MEASURES["l3"].fn(overlapping_batch())
    # note: overlapping_batch() consumes RNG -> build two identical ones
    fix = ConvBatch(
        N=np.arange(90, dtype=float).reshape(30, 3) % 7,
        C=np.full((30, 1), "c", dtype=object),
        y=np.array(["a", "b"] * 15, dtype=object),
    )
    fix2 = ConvBatch(N=fix.N.copy(), C=fix.C.copy(), y=fix.y.copy())
    np.testing.assert_array_equal(
        MEASURES["l3"].fn(fix), MEASURES["l3"].fn(fix2)
    )
    np.testing.assert_array_equal(
        MEASURES["n4"].fn(fix), MEASURES["n4"].fn(fix2)
    )


def test_complexity_t1_hypersphere_cover():
    """Separable blobs: a handful of spheres cover everything -> tiny
    t1; heavy class overlap -> most spheres survive (complexity.py:
    2046-2259)."""
    sep, ovl = separable_batch(), overlapping_batch()
    assert MEASURES["t1"].fn(sep) < 0.15
    assert MEASURES["t1"].fn(ovl) > 0.5
    # mutual-enemy pair: two points, each the other's enemy -> one
    # sphere absorbs nothing, both radii are half the distance, t1 = 1
    two = ConvBatch(
        N=np.array([[0.0], [1.0]]),
        C=np.full((2, 1), "c", dtype=object),
        y=np.array(["a", "b"], dtype=object),
    )
    assert MEASURES["t1"].fn(two) == pytest.approx(1.0)


def test_complexity_graph_trio():
    """density/cls_coef in [0,1]; hubs per-instance in [0,1]; a
    same-class-connected easy dataset is denser (lower 1-density) than
    an interleaved one (complexity.py:2498-2774)."""
    sep, ovl = separable_batch(), overlapping_batch()
    d_sep = MEASURES["density"].fn(sep)
    d_ovl = MEASURES["density"].fn(ovl)
    assert 0.0 <= d_sep <= 1.0 and 0.0 <= d_ovl <= 1.0
    assert d_sep < d_ovl  # cross-class edge removal bites harder on ovl
    cc = MEASURES["cls_coef"].fn(sep)
    assert 0.0 <= cc <= 1.0
    hubs = MEASURES["hubs"].fn(sep)
    assert hubs.shape == (60,)
    assert np.all(hubs >= 0.0) and np.all(hubs <= 1.0)
    assert hubs.min() == pytest.approx(0.0)  # max hub score normalized to 1


def test_complexity_group_complete():
    """All 22 reference complexity measures are registered
    (complexity.py ft_* inventory)."""
    expected = {
        "f1", "f1v", "f2", "f3", "f4", "l1", "l2", "l3", "n1", "n2",
        "n3", "n4", "c1", "c2", "t1", "t2", "t3", "t4", "lsc",
        "density", "cls_coef", "hubs",
    }
    have = {m for m, d in MEASURES.items() if d.group == "complexity"}
    assert expected <= have, expected - have


# --- rescale option ----------------------------------------------------


def test_rescale_numeric_goldens():
    """Scaler semantics mirror the reference's rescale_data
    (_internal.py:1627-1667, sklearn Standard/MinMax/Robust): mean/var
    after standard, min/max after min-max, median/IQR after robust
    (test model: reference tests/test_scaling.py:16-86)."""
    from pymfe_spark.plans.extractor import rescale_numeric

    rng = np.random.RandomState(3)
    N = rng.uniform(-5, 20, size=(200, 3)) ** 2
    S = rescale_numeric(N, "standard")
    np.testing.assert_allclose(S.mean(axis=0), 0.0, atol=1e-9)
    np.testing.assert_allclose(S.std(axis=0), 1.0, atol=1e-9)
    M = rescale_numeric(N, "min-max")
    np.testing.assert_allclose(M.min(axis=0), 0.0, atol=1e-12)
    np.testing.assert_allclose(M.max(axis=0), 1.0, atol=1e-12)
    R = rescale_numeric(N, "robust")
    np.testing.assert_allclose(np.median(R, axis=0), 0.0, atol=1e-9)
    q1, q3 = np.percentile(R, [25, 75], axis=0)
    np.testing.assert_allclose(q3 - q1, 1.0, atol=1e-9)
    # constant column: zero-range guard, no NaN
    const = np.column_stack([np.full(10, 7.0), np.arange(10.0)])
    for opt in ["standard", "min-max", "robust"]:
        out = rescale_numeric(const, opt)
        assert np.isfinite(out).all(), opt
    with pytest.raises(ValueError):
        rescale_numeric(N, "zscore")


def test_rescale_invariant_and_variant_measures():
    """Scale-invariant measures (n3: 1-NN on gower-normalized
    distances) are unchanged under min-max rescale; scale-dependent
    statistical views change."""
    from pymfe_spark.plans.extractor import KernelConfig, build_batch
    import pandas as pd

    rng = np.random.RandomState(11)
    n = 40
    pdf = pd.DataFrame(
        {
            "conv_id": ["c"] * n,
            "turn_idx": range(n),
            "role": ["user", "assistant"] * (n // 2),
            "tool": [None, "exec"] * (n // 2),
            "text_len": rng.uniform(10, 500, n),
            "ts_delta_s": rng.uniform(1, 60, n),
        }
    )
    raw = build_batch(pdf)
    scaled = build_batch(pdf, cfg=KernelConfig(rescale="min-max"))
    np.testing.assert_allclose(
        MEASURES["n3"].fn(raw), MEASURES["n3"].fn(scaled)
    )
    assert not np.allclose(raw.N.mean(axis=0), scaled.N.mean(axis=0))
