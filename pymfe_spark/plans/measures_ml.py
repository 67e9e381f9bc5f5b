"""Model-dependent measure groups: landmarking, model-based, complexity.

Registered into the same registry as plans.measures; all pure numpy via
plans.ml. Parity targets cited per measure; documented deviations
(no sklearn in this environment):

- landmarking CV folds are BIT-IDENTICAL to sklearn's
  StratifiedKFold(shuffle=False) (plans.ml.stratified_kfold replicates
  _make_test_folds: first-appearance class encoding + sorted-interleave
  allocation); the seeded lm_sample_frac subsample replays the
  reference's exact np.random MT19937 stream. Verified against the
  reference's own published iris landmarking goldens: ALL 7 measures
  exact at lm_sample_frac=0.5, 5 of 7 (+1 mean-only) at 1.0
  (tests/test_reference_goldens.py).
- worst_node/elite_nn rank features by full-CART gini importance
  computed per training fold via np.argsort (landmarking.py:239-290
  does the same via sklearn); on the FULL data the selection can
  differ where sklearn's split-RNG permutes near-tied importances
  (petal length vs width on iris) — the one remaining deviation.
- complexity n1/n2/n3/lsc use the gower normalized distance matrix
  (complexity.py:450-497); t3/t4 use eigen-PCA for the 95%-variance
  component count.
- complexity l1/l2/l3 use a deterministic full-batch hinge-loss linear
  SVM (plans.ml.linear_svm_fit) in place of liblinear dual coordinate
  descent; same objective (0.5||w||^2 + 2.0*sum hinge on standardized
  features), solver differs.
- density/cls_coef/hubs replace igraph with dense-numpy graph formulas
  (edge count, 3*triangles/triples via trace(A^3), principal
  eigenvector hub scores).
"""

from __future__ import annotations

import numpy as np

from pymfe_spark.plans.measures import ConvBatch, measure
from pymfe_spark.plans.ml import (
    NumpyCART,
    check_score,
    feature_importance_full_dt,
    gnb_fit_predict,
    gower_norm_dist,
    lda_fit_predict,
    minimum_spanning_tree_edges,
    one_nn_fit_predict,
    stratified_kfold,
)

N_FOLDS = 10  # reference default num_cv_folds (mfe.py:63)
SEED = 42


# ---------------------------------------------------------------------
# landmarking (/root/reference/pymfe/landmarking.py, 7 measures)
# ---------------------------------------------------------------------


def _lm_data(b: ConvBatch) -> tuple[np.ndarray, np.ndarray]:
    """(N, y) for landmarking, after the optional lm_sample_frac
    subsample (landmarking.py:198-236 _get_sample_inds/_sample_data:
    seeded choice WITHOUT replacement of int(frac*n) rows, one shared
    index set for every landmarker — the precompute_landmarking_sample
    contract)."""
    frac = float(b.config.get("lm_sample_frac", 1.0))
    if frac >= 1.0:
        return b.N, b.y
    if "lm_sample_inds" not in b._cache:
        rng = np.random.RandomState(b.config.get("seed", SEED))
        b._cache["lm_sample_inds"] = rng.choice(
            b.y.size, size=int(frac * b.y.size), replace=False
        )
    inds = b._cache["lm_sample_inds"]
    return b.N[inds, :], b.y[inds]


def _cv_scores(b: ConvBatch, fit_predict) -> np.ndarray:
    """Per-fold score vector (the reference's per-fold score shape —
    landmarking measures return k values, summarized downstream).
    Folds, scorer and subsample honor the per-extraction config
    (num_cv_folds mfe.py:63, score scoring.py:6-28, lm_sample_frac
    mfe.py:199-201)."""
    n_folds = int(b.config.get("num_cv_folds", N_FOLDS))
    scorer = check_score(b.config.get("score", "accuracy"))
    N, y = _lm_data(b)
    scores = []
    for i, (tr, te) in enumerate(stratified_kfold(y, n_folds)):
        pred = fit_predict(N[tr], y[tr], N[te], i)
        scores.append(scorer(y[te], pred))
    return np.array(scores)


def _fold_importances(b: ConvBatch) -> list:
    """Per-fold full-CART feature importances computed ONCE and shared
    by worst_node and elite_nn — the reference's cv_folds_imp_rank
    precompute (landmarking.py:160-195); previously each measure refit
    the full tree per fold (2x10 fits -> 10)."""
    if "cv_fold_imp" not in b._cache:
        n_folds = int(b.config.get("num_cv_folds", N_FOLDS))
        N, y = _lm_data(b)
        b._cache["cv_fold_imp"] = [
            feature_importance_full_dt(N[tr], y[tr])
            for tr, _ in stratified_kfold(y, n_folds)
        ]
    return b._cache["cv_fold_imp"]


@measure("best_node", "landmarking", needs_y=True)
def _best_node(b: ConvBatch) -> np.ndarray:
    """Depth-1 DT on all features, 10-fold CV accuracy
    (landmarking.py:293-394)."""
    return _cv_scores(
        b,
        lambda Xtr, ytr, Xte, fold_i: NumpyCART(max_depth=1)
        .fit(Xtr, ytr)
        .predict(Xte),
    )


@measure("random_node", "landmarking", needs_y=True)
def _random_node(b: ConvBatch) -> np.ndarray:
    """Depth-1 DT on ONE seeded-random feature shared by every fold —
    the reference draws rand_ind_attr once, before the fold loop
    (landmarking.py:482-486: np.random.seed(random_state);
    np.random.randint(0, d, size=1)); RandomState(seed) replays the
    same MT19937 stream."""
    N, _ = _lm_data(b)
    f = int(
        np.random.RandomState(b.config.get("seed", SEED)).randint(
            0, N.shape[1], size=1
        )[0]
    )

    def fp(Xtr, ytr, Xte, fold_i):
        return (
            NumpyCART(max_depth=1)
            .fit(Xtr[:, [f]], ytr)
            .predict(Xte[:, [f]])
        )

    return _cv_scores(b, fp)


@measure("worst_node", "landmarking", needs_y=True)
def _worst_node(b: ConvBatch) -> np.ndarray:
    """Depth-1 DT on the least-important feature per training fold
    (landmarking.py:504-624): imp_rank = np.argsort(importances) of a
    full DT fit on the fold's training split, feature = imp_rank[0]
    (argsort's introsort tie order, not argmin's first-minimum)."""
    imps = _fold_importances(b)

    def fp(Xtr, ytr, Xte, fold_i):
        f = int(np.argsort(imps[fold_i])[0])
        return (
            NumpyCART(max_depth=1)
            .fit(Xtr[:, [f]], ytr)
            .predict(Xte[:, [f]])
        )

    return _cv_scores(b, fp)


@measure("elite_nn", "landmarking", needs_y=True)
def _elite_nn(b: ConvBatch) -> np.ndarray:
    """1-NN on the most-important feature per training fold
    (landmarking.py:933-1050): feature = np.argsort(importances)[-1]."""
    imps = _fold_importances(b)

    def fp(Xtr, ytr, Xte, fold_i):
        f = int(np.argsort(imps[fold_i])[-1])
        return one_nn_fit_predict(Xtr[:, [f]], ytr, Xte[:, [f]])

    return _cv_scores(b, fp)


@measure("linear_discr", "landmarking", needs_y=True)
def _linear_discr(b: ConvBatch) -> np.ndarray:
    """LDA landmarker (landmarking.py:625-726)."""
    return _cv_scores(b, lambda Xtr, ytr, Xte, fold_i: lda_fit_predict(Xtr, ytr, Xte))


@measure("naive_bayes", "landmarking", needs_y=True)
def _naive_bayes(b: ConvBatch) -> np.ndarray:
    """Gaussian NB landmarker (landmarking.py:727-828)."""
    return _cv_scores(b, lambda Xtr, ytr, Xte, fold_i: gnb_fit_predict(Xtr, ytr, Xte))


@measure("one_nn", "landmarking", needs_y=True)
def _one_nn(b: ConvBatch) -> np.ndarray:
    """1-NN landmarker (landmarking.py:829-932)."""
    return _cv_scores(
        b, lambda Xtr, ytr, Xte, fold_i: one_nn_fit_predict(Xtr, ytr, Xte)
    )


# ---------------------------------------------------------------------
# model-based (/root/reference/pymfe/model_based.py, 14 measures) —
# all read one fitted CART per conversation (precompute 55-150)
# ---------------------------------------------------------------------


def _dt(b: ConvBatch) -> NumpyCART:
    if "dt_model" not in b._cache:
        b._cache["dt_model"] = NumpyCART().fit(b.N, b.y)
    return b._cache["dt_model"]


measure("leaves", "model-based", needs_y=True)(
    lambda b: float(_dt(b).n_leaves)
)  # model_based.py:264


@measure("tree_depth", "model-based", needs_y=True)
def _tree_depth(b: ConvBatch) -> np.ndarray:
    """Depth of every node (model_based.py:288)."""
    return _dt(b).node_depths.astype(float)


@measure("leaves_branch", "model-based", needs_y=True)
def _leaves_branch(b: ConvBatch) -> np.ndarray:
    """Depth per leaf (model_based.py:323)."""
    t = _dt(b)
    return t.node_depths[t.leaf_mask].astype(float)


@measure("leaves_corrob", "model-based", needs_y=True)
def _leaves_corrob(b: ConvBatch) -> np.ndarray:
    """Leaf support / total samples (model_based.py:369)."""
    t = _dt(b)
    ns = np.array(t.n_node_samples)
    return ns[t.leaf_mask] / ns[0]


def _tree_shape_vec(t: NumpyCART) -> np.ndarray:
    leaf_depths = t.node_depths[t.leaf_mask]
    p = np.power(2.0, -leaf_depths.astype(float))
    return -p * np.log2(p)


@measure("tree_shape", "model-based", needs_y=True)
def _tree_shape(b: ConvBatch) -> np.ndarray:
    """-p log2 p of the random-walk arrival probability per leaf
    (model_based.py:420)."""
    return _tree_shape_vec(_dt(b))


@measure("leaves_homo", "model-based", needs_y=True)
def _leaves_homo(b: ConvBatch) -> np.ndarray:
    """n_leaves / tree_shape (model_based.py:475)."""
    t = _dt(b)
    return t.n_leaves / _tree_shape_vec(t)


@measure("leaves_per_class", "model-based", needs_y=True)
def _leaves_per_class(b: ConvBatch) -> np.ndarray:
    """Leaf-majority class distribution (model_based.py:535)."""
    t = _dt(b)
    leaf_cls = [
        int(np.argmax(t.value[i]))
        for i in range(t.node_count)
        if t.feature[i] == t.LEAF
    ]
    _, freqs = np.unique(leaf_cls, return_counts=True)
    return freqs / t.n_leaves


measure("nodes", "model-based", needs_y=True)(
    lambda b: float(_dt(b).node_count - _dt(b).n_leaves)
)  # model_based.py:579


@measure("nodes_per_attr", "model-based", needs_y=True)
def _nodes_per_attr(b: ConvBatch) -> float:
    t = _dt(b)
    return (t.node_count - t.n_leaves) / b.N.shape[1]  # model_based.py:603


@measure("nodes_per_inst", "model-based", needs_y=True)
def _nodes_per_inst(b: ConvBatch) -> float:
    t = _dt(b)
    return (t.node_count - t.n_leaves) / t.n_node_samples[0]  # :629


@measure("nodes_per_level", "model-based", needs_y=True)
def _nodes_per_level(b: ConvBatch) -> np.ndarray:
    """Non-leaf count per depth level (model_based.py:657)."""
    t = _dt(b)
    depths = t.node_depths[~t.leaf_mask]
    if depths.size == 0:
        return np.array([np.nan])
    _, per_level = np.unique(depths, return_counts=True)
    return per_level.astype(float)


@measure("nodes_repeated", "model-based", needs_y=True)
def _nodes_repeated(b: ConvBatch) -> np.ndarray:
    """Reuse count per split attribute (model_based.py:704)."""
    t = _dt(b)
    attrs = [f for f in t.feature if f >= 0]
    if not attrs:
        return np.array([np.nan])
    _, counts = np.unique(attrs, return_counts=True)
    return counts.astype(float)


@measure("var_importance", "model-based", needs_y=True)
def _var_importance(b: ConvBatch) -> np.ndarray:
    """Gini importances (model_based.py:753)."""
    imp = _dt(b).feature_importances_
    if imp.size < b.N.shape[1]:
        imp = np.pad(imp, (0, b.N.shape[1] - imp.size))
    return imp


@measure("tree_imbalance", "model-based", needs_y=True)
def _tree_imbalance(b: ConvBatch) -> np.ndarray:
    """model_based.py:781."""
    t = _dt(b)
    leaf_depths = t.node_depths[t.leaf_mask]
    p = np.power(2.0, -leaf_depths.astype(float))
    vals, counts = np.unique(p, return_counts=True)
    aux = np.power(2.0, -(vals * counts))
    return -aux * np.log2(aux)


# ---------------------------------------------------------------------
# complexity (/root/reference/pymfe/complexity.py, 13 of 22 measures;
# deferred: l1/l2/l3 (internal SVM), t1, n4, graph measures)
# ---------------------------------------------------------------------


def _norm_dist(b: ConvBatch) -> np.ndarray:
    if "gower_dist" not in b._cache:
        b._cache["gower_dist"] = gower_norm_dist(b.N)
    return b._cache["gower_dist"]


def _ovo_pairs(classes: np.ndarray):
    for i in range(classes.size):
        for j in range(i + 1, classes.size):
            yield classes[i], classes[j]


@measure("f1", "complexity", needs_y=True)
def _f1(b: ConvBatch) -> np.ndarray:
    """Fisher's discriminant ratio per feature (complexity.py:731)."""
    classes, cnt = b.classes()
    mean_g = b.N.mean(axis=0)
    cents = np.array([b.N[b.y == c].mean(axis=0) for c in classes])
    numer = np.sum(np.square(cents - mean_g).T * cnt, axis=1)
    denom = np.sum(
        [
            np.square(b.N[b.y == c] - cents[i]).sum(axis=0)
            for i, c in enumerate(classes)
        ],
        axis=0,
    )
    with np.errstate(all="ignore"):
        return 1.0 / (1.0 + numer / denom)


@measure("f2", "complexity", needs_y=True)
def _f2(b: ConvBatch) -> np.ndarray:
    """Per ovo pair: volume of the per-feature overlap region
    (complexity.py:919)."""
    classes, _ = b.classes()
    out = []
    for c1, c2 in _ovo_pairs(classes):
        A, B = b.N[b.y == c1], b.N[b.y == c2]
        maxmax = np.maximum(A.max(axis=0), B.max(axis=0))
        minmin = np.minimum(A.min(axis=0), B.min(axis=0))
        minmax = np.minimum(A.max(axis=0), B.max(axis=0))
        maxmin = np.maximum(A.min(axis=0), B.min(axis=0))
        with np.errstate(all="ignore"):
            out.append(
                float(np.prod(np.maximum(0.0, minmax - maxmin) / (maxmax - minmin)))
            )
    return np.array(out) if out else np.array([np.nan])


@measure("f3", "complexity", needs_y=True)
def _f3(b: ConvBatch) -> np.ndarray:
    """Max individual feature efficiency per ovo pair
    (complexity.py:995)."""
    classes, cnt = b.classes()
    cntmap = dict(zip(classes, cnt))
    out = []
    for c1, c2 in _ovo_pairs(classes):
        A, B = b.N[b.y == c1], b.N[b.y == c2]
        sub = np.vstack((A, B))
        minmax = np.minimum(A.max(axis=0), B.max(axis=0))
        maxmin = np.maximum(A.min(axis=0), B.min(axis=0))
        overlap_num = np.logical_and(sub >= maxmin, sub <= minmax).sum(axis=0)
        out.append(float(overlap_num.min() / (cntmap[c1] + cntmap[c2])))
    return np.array(out) if out else np.array([np.nan])


@measure("f4", "complexity", needs_y=True)
def _f4(b: ConvBatch) -> np.ndarray:
    """Collective feature efficiency per ovo pair (complexity.py:1074):
    iteratively remove the least-overlapping feature and the examples it
    separates."""
    classes, _ = b.classes()
    out = []
    for c1, c2 in _ovo_pairs(classes):
        m1, m2 = b.y == c1, b.y == c2
        union = np.logical_or(m1, m2)
        cls1 = m1[union]
        N_view = b.N[union, :]
        n_total = N_view.shape[0]
        cls1_v = cls1.copy()
        while N_view.size > 0 and N_view.shape[1] > 0:
            A, B = N_view[cls1_v], N_view[~cls1_v]
            if A.size == 0 or B.size == 0:
                N_view = N_view[:0]
                break
            minmax = np.minimum(A.max(axis=0), B.max(axis=0))
            maxmin = np.maximum(A.min(axis=0), B.min(axis=0))
            region = np.logical_and(N_view >= maxmin, N_view <= minmax)
            f = int(np.argmin(region.sum(axis=0)))
            keep = region[:, f]
            N_view = np.delete(N_view[keep], f, axis=1)
            cls1_v = cls1_v[keep]
        out.append(float(N_view.shape[0] / n_total) if n_total else np.nan)
    return np.array(out) if out else np.array([np.nan])


@measure("n1", "complexity", needs_y=True)
def _n1(b: ConvBatch) -> float:
    """Fraction of MST-borderline instances (complexity.py:1542)."""
    D = _norm_dist(b)
    edges = minimum_spanning_tree_edges(D)
    border = {
        v
        for i, j in edges
        if b.y[i] != b.y[j]
        for v in (i, j)
    }
    return len(border) / b.y.size


@measure("n2", "complexity", needs_y=True)
def _n2(b: ConvBatch) -> np.ndarray:
    """Per-instance intra/extra nearest-neighbor ratio
    (complexity.py:1634); returns r/(1+r) per instance."""
    D = _norm_dist(b).copy()
    n = b.y.size
    same = b.y[:, None] == b.y[None, :]
    D_intra = np.where(same, D, np.inf)
    np.fill_diagonal(D_intra, np.inf)
    D_extra = np.where(~same, D, np.inf)
    intra = D_intra.min(axis=1)
    extra = D_extra.min(axis=1)
    with np.errstate(all="ignore"):
        r = intra / extra
        return r / (1.0 + r)


@measure("n3", "complexity", needs_y=True)
def _n3(b: ConvBatch) -> np.ndarray:
    """Leave-one-out 1-NN misclassification indicator per instance
    (complexity.py:1752)."""
    D = _norm_dist(b).copy()
    np.fill_diagonal(D, np.inf)
    nn = np.argmin(D, axis=1)
    return (b.y[nn] != b.y).astype(float)


@measure("lsc", "complexity", needs_y=True)
def _lsc(b: ConvBatch) -> float:
    """Local-set cardinality: 1 - |{(i,j): d_ij < enemy_dist_i}| / n²
    (complexity.py:2395)."""
    D = _norm_dist(b)
    same = b.y[:, None] == b.y[None, :]
    D_enemy = np.where(~same, D, np.inf)
    enemy = D_enemy.min(axis=1)
    return float(1.0 - np.sum(D < enemy[:, None]) / b.y.size**2)


@measure("t2", "complexity")
def _t2(b: ConvBatch) -> float:
    """d / n (complexity.py:2260)."""
    return b.N.shape[1] / b.N.shape[0]


def _num_attr_pca(b: ConvBatch, var_threshold: float = 0.95) -> int:
    """Components for >= 95% variance via eigen-PCA
    (complexity.py:114-169 precompute_pca_tx)."""
    if "num_attr_pca" not in b._cache:
        Xc = b.N - b.N.mean(axis=0)
        ev = np.linalg.eigvalsh(np.cov(Xc, rowvar=False, ddof=1))[::-1]
        ev = np.clip(ev, 0, None)
        total = ev.sum()
        if total <= 0:
            b._cache["num_attr_pca"] = 1
        else:
            csum = np.cumsum(ev) / total
            b._cache["num_attr_pca"] = int(np.searchsorted(csum, var_threshold) + 1)
    return b._cache["num_attr_pca"]


@measure("t3", "complexity")
def _t3(b: ConvBatch) -> float:
    """pca_dims / n (complexity.py:2293)."""
    return _num_attr_pca(b) / b.N.shape[0]


@measure("t4", "complexity")
def _t4(b: ConvBatch) -> float:
    """pca_dims / d (complexity.py:2343)."""
    return _num_attr_pca(b) / b.N.shape[1]


@measure("c1", "complexity", needs_y=True)
def _c1(b: ConvBatch) -> float:
    """Normalized class-proportion entropy (complexity.py:1966)."""
    _, cnt = b.classes()
    p = cnt / cnt.sum()
    k = cnt.size
    if k < 2:
        return float("nan")
    return float(-(p * np.log2(p)).sum() / np.log2(k))


@measure("c2", "complexity", needs_y=True)
def _c2(b: ConvBatch) -> float:
    """Imbalance-ratio based measure (complexity.py:2005)."""
    _, cnt = b.classes()
    k, n = cnt.size, cnt.sum()
    if k < 2:
        return float("nan")
    ir = ((k - 1.0) / k) * np.sum(cnt / (n - cnt))
    return float(1.0 - 1.0 / ir)


# ---------------------------------------------------------------------
# complexity: linearity (l1-l3), interpolation (n4), hypersphere cover
# (t1) and same-class neighbor-graph trio (density/cls_coef/hubs) —
# previously deferred; pure numpy via plans.ml
# ---------------------------------------------------------------------

from pymfe_spark.plans.ml import (  # noqa: E402
    gower_cross_dist,
    graph_density,
    graph_hub_scores,
    graph_transitivity,
    hypersphere_radii,
    interpolate_within_class,
    linear_svm_decision,
    linear_svm_fit,
    nearest_enemies,
    same_class_knn_adjacency,
    scale_minmax,
)


def _scaled_N(b: ConvBatch) -> np.ndarray:
    if "scaled_N" not in b._cache:
        b._cache["scaled_N"] = scale_minmax(b.N)
    return b._cache["scaled_N"]


def _ovo_svms(b: ConvBatch):
    """One fitted linear SVM per ovo class pair, shared by l1/l2/l3
    (the reference precomputes the pipeline once,
    complexity.py:170-229, and refits per pair in each ft_l*)."""
    if "ovo_svms" not in b._cache:
        classes, _ = b.classes()
        fits = []
        for c1, c2 in _ovo_pairs(classes):
            m1, m2 = b.y == c1, b.y == c2
            union = np.logical_or(m1, m2)
            N_sub = b.N[union, :]
            y_sub = m1[union]
            fits.append((N_sub, y_sub, linear_svm_fit(N_sub, y_sub)))
        b._cache["ovo_svms"] = fits
    return b._cache["ovo_svms"]


@measure("l1", "complexity", needs_y=True)
def _l1(b: ConvBatch) -> np.ndarray:
    """Sum of error distance of a linear classifier per ovo pair
    (complexity.py:1183-1307): L1-norm of decision values of
    misclassified points / pair size; 1 - 1/(1+that)."""
    out = []
    for N_sub, y_sub, model in _ovo_svms(b):
        dec = linear_svm_decision(model, N_sub)
        pred = dec > 0
        wrong = pred != y_sub
        err = float(np.abs(dec[wrong]).sum()) if wrong.any() else 0.0
        sum_err = err / y_sub.size
        out.append(1.0 - 1.0 / (1.0 + sum_err))
    return np.array(out) if out else np.array([np.nan])


@measure("l2", "complexity", needs_y=True)
def _l2(b: ConvBatch) -> np.ndarray:
    """Training error rate of the ovo linear classifier
    (complexity.py:1308-1414)."""
    out = []
    for N_sub, y_sub, model in _ovo_svms(b):
        pred = linear_svm_decision(model, N_sub) > 0
        out.append(float(np.mean(pred != y_sub)))
    return np.array(out) if out else np.array([np.nan])


@measure("l3", "complexity", needs_y=True)
def _l3(b: ConvBatch) -> np.ndarray:
    """Non-linearity of the linear classifier (complexity.py:1415-1541):
    error rate on a within-class randomly interpolated copy of the ovo
    subset; seed varies per pair as the reference increments
    random_state per iteration (complexity.py:1510-1514)."""
    out = []
    for ind, (N_sub, y_sub, model) in enumerate(_ovo_svms(b)):
        cls_inds_sub = np.array([~y_sub, y_sub])
        rng = np.random.RandomState(SEED + ind)
        N_int, y_int = interpolate_within_class(
            N_sub, y_sub, cls_inds_sub, rng
        )
        pred = linear_svm_decision(model, N_int) > 0
        out.append(float(np.mean(pred != y_int)))
    return np.array(out) if out else np.array([np.nan])


@measure("n4", "complexity", needs_y=True)
def _n4(b: ConvBatch) -> np.ndarray:
    """Non-linearity of the 1-NN classifier (complexity.py:1830-1965):
    per-interpolated-instance misclassification indicator of a 1-NN
    trained on the normalized (gower) distances of the original data and
    queried with interpolated points."""
    D = _norm_dist(b)
    Ns = _scaled_N(b)
    rng = np.random.RandomState(SEED)
    N_int, y_int = interpolate_within_class(Ns, b.y, b.cls_inds(), rng)
    test_dist = gower_cross_dist(N_int, Ns)
    nn = np.argmin(test_dist, axis=1)
    # D only breaks ties the same way sklearn's precomputed-1NN would;
    # predictions come from the original labels
    _ = D
    return (b.y[nn] != y_int).astype(float)


@measure("t1", "complexity", needs_y=True)
def _t1(b: ConvBatch) -> float:
    """Fraction of hyperspheres needed to cover the data
    (complexity.py:2046-2259): nearest-enemy radii on the original
    (unnormalized-range gower) distances, then larger-mass spheres
    absorb spheres whose centers they contain."""
    D = _norm_dist(b)
    ne_dist, ne_ind = nearest_enemies(D, b.cls_inds())
    if not np.isfinite(ne_dist).all():
        return float("nan")  # single-class slice: no enemies
    radii = hypersphere_radii(ne_dist, ne_ind)
    within = D <= radii  # center of row-sphere inside col-sphere
    mass = within.sum(axis=0)
    order = np.argsort(-mass, kind="stable")
    count = np.ones(radii.size, dtype=int)
    for i in order:
        if count[i] <= 0:
            continue
        members = np.flatnonzero(within[:, i])
        absorbed = int(count[members].sum())
        count[members] = 0
        count[i] = absorbed
    return float(int((count > 0).sum()) / b.y.size)


def _adj_graph(b: ConvBatch) -> np.ndarray:
    if "adj_graph" not in b._cache:
        b._cache["adj_graph"] = same_class_knn_adjacency(
            _norm_dist(b), b.cls_inds()
        )
    return b._cache["adj_graph"]


@measure("density", "complexity", needs_y=True)
def _density(b: ConvBatch) -> float:
    """1 - density of the same-class k-NN graph
    (complexity.py:2498-2590)."""
    return float(1.0 - graph_density(_adj_graph(b)))


@measure("cls_coef", "complexity", needs_y=True)
def _cls_coef(b: ConvBatch) -> float:
    """1 - global clustering coefficient of the same-class k-NN graph
    (complexity.py:2591-2682)."""
    return float(1.0 - graph_transitivity(_adj_graph(b)))


@measure("hubs", "complexity", needs_y=True)
def _hubs(b: ConvBatch) -> np.ndarray:
    """1 - hub score per instance of the same-class k-NN graph
    (complexity.py:2683-2774)."""
    return 1.0 - graph_hub_scores(_adj_graph(b))


@measure("f1v", "complexity", needs_y=True)
def _f1v(b: ConvBatch) -> np.ndarray:
    """Directional-vector Fisher discriminant ratio per ovo pair
    (complexity.py:815-918): Fisher direction d = W⁺(μ1-μ2), then
    1/(1 + dᵀB d / dᵀW d) with class-weighted within-scatter W and
    between-scatter B (np.linalg.pinv in place of scipy.linalg.pinv —
    the reference itself notes pinv-implementation differences do not
    affect the result)."""
    classes, cnt = b.classes()
    cntmap = dict(zip(classes, cnt))
    cents = {c: b.N[b.y == c].mean(axis=0) for c in classes}
    scatter = {c: np.cov(b.N[b.y == c], rowvar=False, ddof=1) for c in classes}
    out = []
    for c1, c2 in _ovo_pairs(classes):
        diff = (cents[c1] - cents[c2]).reshape(-1, 1)
        n_pair = cntmap[c1] + cntmap[c2]
        W = (cntmap[c1] * scatter[c1] + cntmap[c2] * scatter[c2]) / n_pair
        direc = np.linalg.pinv(np.atleast_2d(W)) @ diff
        B = np.outer(diff, diff)
        num = float(direc.T @ B @ direc)
        den = float(direc.T @ np.atleast_2d(W) @ direc)
        with np.errstate(all="ignore"):
            out.append(float(1.0 / (1.0 + num / den)))
    return np.array(out) if out else np.array([np.nan])
