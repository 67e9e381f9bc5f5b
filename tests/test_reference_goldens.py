"""Golden-value parity against the reference's own published test
expectations on its own Iris fixture.

Expected values are the constants from the reference's parametrized
test tables (cited per group below) for dataset id 2
(``tests/test_datasets/num_Iris.arff``), i.e. the [mean, sd] summary
of each measure; comparison uses the reference's own tolerance
(np.allclose(atol=0.001, rtol=0.05, equal_nan=True),
/root/reference/tests/test_statistical.py:213-215).

Fixture mapping: X = the 4 numeric columns -> N; C = each column
equal-frequency discretized (pymfe's transform_num default for
numeric-only data, /root/reference/pymfe/_internal.py:1550-1624);
y = class. orig_cat=0 (all C columns are derived).

Documented exemptions:
- n1/n2/n3/n4/lsc goldens were generated when the complexity distance
  default was min-max-scaled euclidean normalized to [0,1]; the current
  reference defaults to metric="gower" (complexity.py:450-497). The
  engine follows the current reference, so this test injects the
  euclidean-era matrix via the batch cache. (Verified: with it,
  n1/n2/n3 match to 1e-5; with gower they sit ~0.01-0.015 off.)
- l3/n4 depend on randomly interpolated samples; the reference goldens
  used a specific random_state we don't replicate -> atol loosened to
  the scale of ~2 misclassifications out of 150.
- t1's golden is a [mean, sd] pair of a VECTOR, but the current
  reference ft_t1 returns a scalar (complexity.py:2046-2259) — the
  golden predates the hypersphere-agglomeration rewrite. Range-checked
  only.
- density/cls_coef/hubs goldens likewise predate the current same-class
  kNN graph construction (complexity.py:498-551): no parameterization
  of the current code (k, metric, tie rule) reproduces them
  (closest: eps-radius graph). Range/shape-checked only.
(nr_norm is no longer exempt: Shapiro-Wilk/D'Agostino/Anderson-Darling
are implemented from the published algorithms in plans/normality.py
and golden-tested per method below.)
"""

from __future__ import annotations

import warnings

import numpy as np
import pytest

import pymfe_spark.plans.measures_ml  # noqa: F401  (registers groups)
from pymfe_spark.functions.summary import summarize
from pymfe_spark.plans.extractor import _equal_freq_bins
from pymfe_spark.plans.measures import MEASURES, ConvBatch

ARFF = "/root/reference/tests/test_datasets/num_Iris.arff"


def _load_iris():
    rows = [
        line.strip().split(",")
        for line in open(ARFF)
        if line.strip() and not line.startswith(("%", "@"))
    ]
    data = np.array(rows)
    return data[:, :4].astype(float), data[:, 4].astype(object)


def _batch(euclidean_dist: bool = False) -> ConvBatch:
    N, y = _load_iris()
    C = np.column_stack(
        [_equal_freq_bins(N[:, j]).astype(object) for j in range(4)]
    )
    b = ConvBatch(N=N, C=C, y=y, orig_cat=0)
    if euclidean_dist:
        mn, mx = N.min(0), N.max(0)
        S = (N - mn) / np.where(mx > mn, mx - mn, 1.0)
        D = np.sqrt(((S[:, None, :] - S[None, :, :]) ** 2).sum(-1))
        b._cache["gower_dist"] = (D - D.min()) / (D.max() - D.min())
    return b


# measure -> golden [mean, sd] (or scalar). Sources:
#   statistical: /root/reference/tests/test_statistical.py:142-170
#   info-theory: /root/reference/tests/test_infotheo.py:58-65
#   clustering:  /root/reference/tests/test_clustering.py:59-66
#   concept:     /root/reference/tests/test_concept.py:42-45
#   itemset:     /root/reference/tests/test_itemset.py:35-36
#   complexity:  /root/reference/tests/test_complexity.py:115-136
GOLDENS = {
    "can_cor": [0.72548576, 0.36680730],
    "cor": [0.58981572, 0.34191469],
    "cov": [0.59432267, 0.56030719],
    "eigenvalues": [1.14232282, 2.05710822],
    "g_mean": [3.22172156, 2.02456808],
    "gravity": 3.20517457,
    "h_mean": [2.97629003, 2.14893747],
    "iq_range": [1.70000000, 1.27540843],
    "kurtosis": [-0.79537400, 0.75835782],
    "lh_trace": 32.54951329402913,
    "mad": [1.07488500, 0.60678020],
    "max": [5.42500000, 2.44318781],
    "mean": [3.46366667, 1.91901800],
    "median": [3.61250000, 1.91936404],
    "min": [1.85000000, 1.80831413],
    "nr_cor_attr": 0.5,
    "nr_disc": 2,
    "nr_outliers": 1,
    "p_trace": 1.1872067523722512,
    "range": [3.57500000, 1.65000000],
    "roy_root": 32.27195242,
    "sd": [0.94731040, 0.57146108],
    "sd_ratio": 1.27345134,
    "skewness": [0.06603418, 0.29886394],
    "sparsity": [0.02871478, 0.01103236],
    "t_mean": [3.46972222, 1.90505400],
    "var": [1.14232282, 1.33129110],
    "w_lambda": 0.02352545,
    "attr_conc": [0.20922253, 0.11995021],
    "attr_ent": [2.27901045, 0.05742642],
    "class_conc": [0.27232600, 0.14258949],
    "class_ent": 1.58496250,
    "eq_num_attr": 1.88240501,
    "joint_ent": [3.02198491, 0.38738119],
    "mut_inf": [0.84198804, 0.42518056],
    "ns_ratio": 1.70670169,
    "ch": 486.32083931855703,
    "int": 3.321079768101941,
    "nre": 1.0986122886681096,
    "pb": -0.6798579850365509,
    "sc": 0,
    "sil": 0.5032506980366624,
    "vdb": 0.7517428073901388,
    "vdu": 2.3392212797698888e-05,
    "cohesiveness": [67.12, 5.3592987],
    "conceptvar": [0.4956224, 0.07772438],
    "impconceptvar": [42.626667, 5.358048],
    "wg_dist": [0.46218988, 0.05621875],
    "one_itemset": [0.2, 0.049322903],
    "two_itemset": [0.32, 0.084694475],
    "c1": 1.0,
    "c2": 0.0,
    "f1": [0.279814645, 0.264900694],
    "f1v": [0.026773189, 0.033791788],
    "f2": [0.006381766, 0.011053544],
    "f3": [0.123333333, 0.213619600],
    "f4": [0.043333333, 0.075055535],
    "l1": [0.004335693, 0.007509640],
    "l2": [0.013333333, 0.023094011],
    "l3": [0.003333333, 0.005773503],
    "lsc": 0.816400000,
    "n1": 0.1,
    "n2": [0.21094362, 0.1366869],
    "n3": [0.046666667, 0.2116305],
    "n4": [0.013333334, 0.11508193],
    "t2": 0.026666667,
    "t3": 0.013333333,
    "t4": 0.5,
}

EUCLIDEAN_ERA = {"n1", "n2", "n3", "n4", "lsc"}
# seeded interpolation differs from the goldens' random_state: compare
# the mean only (the sd of a near-zero Bernoulli indicator vector swings
# ~40% on one extra misclassification out of 150)
RNG_DEPENDENT_ATOL = {"l3": 0.02, "n4": 0.02}


@pytest.mark.parametrize("name", sorted(GOLDENS))
def test_iris_golden(name):
    b = _batch(euclidean_dist=name in EUCLIDEAN_ERA)
    with np.errstate(all="ignore"), warnings.catch_warnings():
        warnings.simplefilter("ignore")
        val = MEASURES[name].fn(b)
    s = summarize(name, val, ("mean", "sd"))
    exp = GOLDENS[name]
    if isinstance(exp, list):
        got = [s[f"{name}.mean"], s[f"{name}.sd"]]
        if name in RNG_DEPENDENT_ATOL:
            got, exp = got[:1], exp[:1]
    else:
        got, exp = [s.get(name, s.get(f"{name}.mean"))], [exp]
    atol = RNG_DEPENDENT_ATOL.get(name, 0.001)
    assert np.allclose(got, exp, atol=atol, rtol=0.05, equal_nan=True), (
        f"{name}: got {got}, expected {exp}"
    )


# landmarking goldens (/root/reference/tests/test_landmarking.py:54-84,
# random_state=1234): [mean, sd] per measure, at lm_sample_frac 1.0 and
# 0.5. The 0.5 table matches EXACTLY (bit-level parity of the seeded
# subsample indices, the sklearn StratifiedKFold(shuffle=False) fold
# boundaries, and the stump/LDA/GNB/1-NN learners). At 1.0, worst_node
# and elite_nn depend on sklearn's split-RNG feature permutation for
# near-tied full-tree importances (petal length vs width) — exempted
# with elite_nn checked on the mean (passes the reference tolerance).
LM_FULL = {
    "best_node": [0.6666666, 6.282881e-08],
    "elite_nn": [0.88],  # mean-only: importance tie permutation
    "linear_discr": [0.98, 0.044996567],
    "naive_bayes": [0.9533334, 0.044996567],
    "one_nn": [0.96000004, 0.056218266],
    "random_node": [0.66666663, 6.2828811e-08],
}
LM_HALF = {
    "best_node": [0.5982143, 0.02823461],
    "elite_nn": [0.9196428, 0.14803368],
    "linear_discr": [0.9732143, 0.056625884],
    "naive_bayes": [0.9464285, 0.09105392],
    "one_nn": [1.0, 0.0],
    "random_node": [0.5982143, 0.02823461],
    "worst_node": [0.5696429, 0.1032528],
}


# model-based goldens (/root/reference/tests/test_model_based.py:
# dataset 2 block, random_state=1234): 13 of 14 match — the NumpyCART
# tree has identical structure (same leaf depths, node counts, split
# counts per level, importances) to sklearn's; only nodes_repeated
# differs because two tie splits pick a different (equally-scoring)
# attribute under sklearn's split-RNG permutation, changing the
# per-attribute reuse histogram while every structural metric agrees.
MB_GOLD = {
    "leaves": 9,
    "leaves_branch": [3.7777777, 1.2018504],
    "leaves_corrob": [0.11111111, 0.15051763],
    "leaves_homo": [37.466667, 13.142298],
    "leaves_per_class": [0.33333334, 0.22222224],
    "nodes": 8,
    "nodes_per_attr": 2.0,
    "nodes_per_inst": 0.05333333333333334,
    "nodes_per_level": [1.6, 0.8944272],
    "tree_depth": [3.0588236, 1.4348601],
    "tree_imbalance": [0.19491705, 0.1330071],
    "tree_shape": [0.27083334, 0.107119605],
    "var_importance": [0.24999999, 0.27823895],
}


@pytest.mark.parametrize("name", sorted(MB_GOLD))
def test_iris_model_based_golden(name):
    gold = MB_GOLD[name]
    b = _batch()
    with np.errstate(all="ignore"), warnings.catch_warnings():
        warnings.simplefilter("ignore")
        v = MEASURES[name].fn(b)
    arr = np.atleast_1d(np.asarray(v, dtype=float))
    if isinstance(gold, list):
        got = [float(arr.mean()), float(arr.std(ddof=1))]
    else:
        got, gold = [float(arr.mean())], [gold]
    assert np.allclose(got, gold, atol=0.001, rtol=0.05), (name, got, gold)


def test_nodes_repeated_exempt_but_consistent():
    """nodes_repeated: per-attribute split-reuse counts — the one
    model-based measure where sklearn's split-RNG attribute choice on
    tie splits changes the histogram (see MB_GOLD note). Assert the
    structural invariant instead: reuse counts sum to the split-node
    count."""
    b = _batch()
    v = np.asarray(MEASURES["nodes_repeated"].fn(b), dtype=float)
    assert v.sum() == MEASURES["nodes"].fn(b)


@pytest.mark.parametrize(
    "frac,name",
    [(1.0, n) for n in sorted(LM_FULL)] + [(0.5, n) for n in sorted(LM_HALF)],
)
def test_iris_landmarking_golden(frac, name):
    gold = (LM_FULL if frac == 1.0 else LM_HALF)[name]
    b = _batch()
    b.config.update({"seed": 1234, "lm_sample_frac": frac})
    with np.errstate(all="ignore"), warnings.catch_warnings():
        warnings.simplefilter("ignore")
        v = MEASURES[name].fn(b)
    got = [float(np.mean(v)), float(np.std(v, ddof=1))][: len(gold)]
    assert np.allclose(got, gold, atol=0.001, rtol=0.05), (name, got, gold)


def test_summary_reference_goldens():
    """The sigma layer against the reference's own summary-test values
    (/root/reference/tests/test_summary.py): 5-bin histogram of 1..10
    is uniform; numpy-interpolation quantiles; method-3 skewness of a
    symmetric vector is 0; method-3 kurtosis of 1..10; ddof=1 ->
    NaN on singletons (sd/var and nan variants)."""
    from pymfe_spark.functions.summary import SUMMARY_REGISTRY

    mf = np.arange(1.0, 11.0)
    assert np.allclose(
        SUMMARY_REGISTRY["histogram"](mf, bins=5), [0.2] * 5
    )
    assert np.allclose(
        SUMMARY_REGISTRY["quantiles"](mf), [1.0, 3.25, 5.5, 7.75, 10.0]
    )
    assert np.allclose(SUMMARY_REGISTRY["skewness"](mf), 0.0)
    assert np.allclose(
        SUMMARY_REGISTRY["kurtosis"](mf), -1.5616363636363637
    )
    for s in ("sd", "var", "nansd", "nanvar"):
        assert np.isnan(SUMMARY_REGISTRY[s](np.array([1.0])))


def test_iris_exempted_measures_sane():
    """t1 / density / cls_coef / hubs: goldens predate the current
    reference implementations (see module docstring) — assert shape
    and range instead of exact values."""
    b = _batch()
    with np.errstate(all="ignore"), warnings.catch_warnings():
        warnings.simplefilter("ignore")
        t1 = MEASURES["t1"].fn(b)
        density = MEASURES["density"].fn(b)
        cls_coef = MEASURES["cls_coef"].fn(b)
        hubs = MEASURES["hubs"].fn(b)
    assert 0.0 < t1 < 0.2  # a few spheres cover the 3 iris blobs
    assert 0.7 < density < 0.95
    assert 0.0 < cls_coef < 0.5
    assert hubs.shape == (150,) and 0.6 < hubs.mean() < 0.95


@pytest.mark.parametrize(
    "method, failure, exp",
    [
        ("shapiro-wilk", "soft", 1.0),
        ("dagostino-pearson", "soft", 2.0),
        ("anderson-darling", "soft", 2.0),
        ("all", "soft", 2.0),
        ("all", "hard", 1.0),
    ],
)
def test_iris_nr_norm_per_method_golden(method, failure, exp):
    """nr_norm per normality test against the reference's OWN iris
    expectations (/root/reference/tests/test_statistical.py:219-250) —
    the pure-numpy Shapiro-Wilk (AS R94), D'Agostino K² and
    Anderson-Darling (incl. the reference's percent-vs-fraction
    significance-pick quirk) in plans/normality.py."""
    N, y = _load_iris()
    C = np.column_stack(
        [_equal_freq_bins(N[:, j]).astype(object) for j in range(4)]
    )
    b = ConvBatch(
        N=N,
        C=C,
        y=y,
        orig_cat=0,
        config={"measure_kwargs": {"nr_norm": {"method": method, "failure": failure}}},
    )
    assert MEASURES["nr_norm"].fn(b) == exp


def test_iris_normality_statistics_pinned():
    """Statistic-level pins (not just accept/reject): the iris per-column
    Shapiro W/p, D'Agostino K² and Anderson A² — W=0.9761/p=0.0102 and
    W=0.9838/p=0.0752 for sepal length/width are the widely published
    scipy.stats.shapiro outputs, so any drift in the AS R94 weights,
    ndtri, or the p-value transform fails here at value resolution."""
    from pymfe_spark.plans.normality import (
        anderson_darling_norm,
        dagostino_pearson,
        shapiro_wilk,
    )

    N, _ = _load_iris()
    pinned = [
        (0.976090, 0.0101812, 5.735584, 0.0568242, 0.889199),
        (0.983792, 0.0751792, 3.576642, 0.167241, 0.965665),
        (0.876425, 7.54542e-10, 221.331787, 8.67787e-49, 7.672883),
        (0.902625, 1.86476e-08, 136.777018, 1.99181e-30, 5.062814),
    ]
    for col, (w_e, p_e, k2_e, pk_e, a2_e) in enumerate(pinned):
        w, p = shapiro_wilk(N[:, col])
        k2, pk = dagostino_pearson(N[:, col])
        a2, _crit = anderson_darling_norm(N[:, col])
        assert np.isclose(w, w_e, atol=1e-5) and np.isclose(p, p_e, rtol=1e-3)
        assert np.isclose(k2, k2_e, atol=1e-4) and np.isclose(pk, pk_e, rtol=1e-3)
        assert np.isclose(a2, a2_e, atol=1e-4)
