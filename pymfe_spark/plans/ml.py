"""Pure-numpy ML primitives for the model-dependent measure groups.

The container has no sklearn/scipy, so the landmarking / model-based /
complexity groups are backed by from-scratch numpy implementations of
the public algorithms:

- :class:`NumpyCART` — gini CART classifier (sklearn
  DecisionTreeClassifier defaults: best-first binary splits on
  midpoint thresholds, grow to purity, gini feature importances);
  exposes the ``tree_``-style arrays the model-based formulas read
  (/root/reference/pymfe/model_based.py:55-261).
- :func:`stratified_kfold` — per-class contiguous-chunk K folds
  (sklearn StratifiedKFold(shuffle=False) semantics; raises like
  sklearn when a class has fewer members than folds).
- depth-1 stumps, LDA, Gaussian NB, 1-NN — the landmarkers
  (/root/reference/pymfe/landmarking.py:293-1050).

Conversation batches are small (10²-10⁴ turns), so O(n²) / recursive
algorithms here are bounded; the extractor caps batch size upstream.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


# ---------------------------------------------------------------------
# stratified k-fold
# ---------------------------------------------------------------------


def stratified_kfold(y: np.ndarray, k: int = 10):
    """Yield (train_idx, test_idx) pairs replicating sklearn's
    StratifiedKFold(shuffle=False)._make_test_folds EXACTLY: classes
    encoded by first appearance, per-fold-per-class allocation from the
    sorted interleave bincount (fold i's class quota = bincount of
    y_sorted[i::k]), each class's occurrences assigned to folds in
    data order. Bit-identical fold boundaries let the landmarking
    kernels reproduce the reference's own published goldens, including
    the lm_sample_frac subsample cases where class counts are uneven
    (a per-class array_split puts the larger chunks in different folds
    and every downstream accuracy shifts).

    Raises ValueError when the rarest class has fewer than ``k``
    members (mirrors sklearn so the landmarking kernel degrades to NaN
    through the exception-containment path)."""
    _, y_first, y_inv = np.unique(y, return_index=True, return_inverse=True)
    # sklearn orders classes by first appearance in the data
    _, class_perm = np.unique(y_first, return_inverse=True)
    y_encoded = class_perm[y_inv]
    n_classes = y_first.size
    y_counts = np.bincount(y_encoded)
    if y_counts.min() < k:
        raise ValueError(
            f"n_splits={k} greater than member count of the rarest class"
        )
    y_order = np.sort(y_encoded)
    allocation = np.asarray(
        [np.bincount(y_order[i::k], minlength=n_classes) for i in range(k)]
    )
    test_folds = np.empty(y.size, dtype=int)
    for c in range(n_classes):
        folds_for_class = np.arange(k).repeat(allocation[:, c])
        test_folds[y_encoded == c] = folds_for_class
    all_idx = np.arange(y.size)
    for f in range(k):
        test = all_idx[test_folds == f]
        train = all_idx[test_folds != f]
        yield train, test


def accuracy(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    return float(np.mean(y_true == y_pred))


def balanced_accuracy(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """Macro-average of per-class recall (sklearn
    balanced_accuracy_score semantics; /root/reference/pymfe/
    scoring.py:11-13)."""
    classes = np.unique(y_true)
    recalls = [
        float(np.mean(y_pred[y_true == c] == c)) for c in classes
    ]
    return float(np.mean(recalls))


def f1(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """Support-weighted mean of per-class F1 (sklearn
    f1_score(average="weighted"); /root/reference/pymfe/
    scoring.py:16-18). Classes absent from y_true contribute zero
    weight; zero-division cases score 0 per sklearn's default."""
    classes, support = np.unique(y_true, return_counts=True)
    f1s = []
    for c in classes:
        tp = float(np.sum((y_pred == c) & (y_true == c)))
        fp = float(np.sum((y_pred == c) & (y_true != c)))
        fn = float(np.sum((y_pred != c) & (y_true == c)))
        denom = 2 * tp + fp + fn
        f1s.append(2 * tp / denom if denom > 0 else 0.0)
    return float(np.average(f1s, weights=support))


# scoring registry (/root/reference/pymfe/scoring.py:6-28 +
# check_score _internal.py:1670-1717); kappa/auc are unimplemented in
# the reference too
SCORERS = {
    "accuracy": accuracy,
    "balanced-accuracy": balanced_accuracy,
    "f1": f1,
}


def check_score(score: str):
    """Resolve a scorer name (check_score, _internal.py:1670-1717)."""
    if score not in SCORERS:
        raise ValueError(
            f"unknown score {score!r}; choose one of {sorted(SCORERS)}"
        )
    return SCORERS[score]


# ---------------------------------------------------------------------
# CART (gini)
# ---------------------------------------------------------------------


@dataclass
class NumpyCART:
    """Gini CART classifier with sklearn tree_-style arrays."""

    max_depth: int | None = None
    # tree arrays (filled by fit)
    feature: list = field(default_factory=list)  # -2 for leaves
    threshold: list = field(default_factory=list)
    children_left: list = field(default_factory=list)
    children_right: list = field(default_factory=list)
    n_node_samples: list = field(default_factory=list)
    value: list = field(default_factory=list)  # class counts per node
    impurity: list = field(default_factory=list)
    depth: list = field(default_factory=list)

    LEAF = -2

    def fit(self, X: np.ndarray, y: np.ndarray) -> "NumpyCART":
        self.classes_, y_enc = np.unique(y, return_inverse=True)
        self._k = self.classes_.size
        self._n = X.shape[0]
        self._build(X, y_enc, np.arange(X.shape[0]), depth=0)
        return self

    # -- internals ----------------------------------------------------

    def _gini(self, counts: np.ndarray) -> float:
        n = counts.sum()
        if n == 0:
            return 0.0
        p = counts / n
        return float(1.0 - (p * p).sum())

    def _best_split(self, X, y, idx):
        """(feature, threshold, gain) of the best gini split, or None."""
        counts = np.bincount(y[idx], minlength=self._k)
        parent_gini = self._gini(counts)
        n = idx.size
        best = None
        for f in range(X.shape[1]):
            xs = X[idx, f]
            order = np.argsort(xs, kind="mergesort")
            xs_sorted = xs[order]
            ys_sorted = y[idx][order]
            # candidate cuts between distinct adjacent values
            diff = np.flatnonzero(xs_sorted[1:] != xs_sorted[:-1])
            if diff.size == 0:
                continue
            # prefix class counts, then weighted child gini for ALL
            # candidate cuts at once (the per-cut Python loop was the
            # kernel hot spot: ~10 ms per full-CART fit at ~70 rows)
            onehot = np.zeros((n, self._k))
            onehot[np.arange(n), ys_sorted] = 1.0
            prefix = np.cumsum(onehot, axis=0)
            left = prefix[diff]
            nl = (diff + 1).astype(float)
            nr = n - nl
            right = counts - left
            g_left = 1.0 - (left**2).sum(axis=1) / nl**2
            g_right = 1.0 - (right**2).sum(axis=1) / nr**2
            g = (nl * g_left + nr * g_right) / n
            i = int(np.argmin(g))  # first minimum == first-best cut
            gain = parent_gini - g[i]
            if best is None or gain > best[2] + 1e-15:
                cut = int(diff[i])
                thr = (xs_sorted[cut] + xs_sorted[cut + 1]) / 2.0
                best = (f, thr, gain)
        return best

    def _add_node(self, y, idx, depth) -> int:
        node = len(self.feature)
        counts = np.bincount(y[idx], minlength=self._k)
        self.feature.append(self.LEAF)
        self.threshold.append(np.nan)
        self.children_left.append(-1)
        self.children_right.append(-1)
        self.n_node_samples.append(int(idx.size))
        self.value.append(counts.astype(float))
        self.impurity.append(self._gini(counts))
        self.depth.append(depth)
        return node

    def _build(self, X, y, idx, depth) -> int:
        node = self._add_node(y, idx, depth)
        counts = self.value[node]
        if (
            (self.max_depth is not None and depth >= self.max_depth)
            or idx.size < 2
            or np.count_nonzero(counts) < 2
        ):
            return node
        # sklearn splits on zero impurity decrease too (XOR-style data);
        # children always strictly shrink, so recursion terminates
        best = self._best_split(X, y, idx)
        if best is None:
            return node
        f, thr, _ = best
        mask = X[idx, f] <= thr
        self.feature[node] = f
        self.threshold[node] = thr
        self.children_left[node] = self._build(X, y, idx[mask], depth + 1)
        self.children_right[node] = self._build(X, y, idx[~mask], depth + 1)
        return node

    # -- sklearn-ish surface -------------------------------------------

    @property
    def node_count(self) -> int:
        return len(self.feature)

    @property
    def leaf_mask(self) -> np.ndarray:
        return np.array(self.feature) == self.LEAF

    @property
    def n_leaves(self) -> int:
        return int(self.leaf_mask.sum())

    @property
    def node_depths(self) -> np.ndarray:
        return np.array(self.depth)

    @property
    def feature_importances_(self) -> np.ndarray:
        """Gini importance, normalized (sklearn semantics)."""
        d = max((f for f in self.feature if f >= 0), default=-1) + 1
        d = max(d, 1)
        imp = np.zeros(d)
        n_root = self.n_node_samples[0]
        for node, f in enumerate(self.feature):
            if f < 0:
                continue
            l, r = self.children_left[node], self.children_right[node]
            nt = self.n_node_samples[node]
            imp[f] += (
                nt * self.impurity[node]
                - self.n_node_samples[l] * self.impurity[l]
                - self.n_node_samples[r] * self.impurity[r]
            ) / n_root
        s = imp.sum()
        return imp / s if s > 0 else imp

    def predict(self, X: np.ndarray) -> np.ndarray:
        out = np.empty(X.shape[0], dtype=self.classes_.dtype)
        for i in range(X.shape[0]):
            node = 0
            while self.feature[node] >= 0:
                if X[i, self.feature[node]] <= self.threshold[node]:
                    node = self.children_left[node]
                else:
                    node = self.children_right[node]
            out[i] = self.classes_[int(np.argmax(self.value[node]))]
        return out


def feature_importance_full_dt(X: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Importance vector of a full CART — the reference's
    _rank_feat_importance basis (landmarking.py:239-290)."""
    tree = NumpyCART().fit(X, y)
    imp = tree.feature_importances_
    if imp.size < X.shape[1]:
        imp = np.pad(imp, (0, X.shape[1] - imp.size))
    return imp


# ---------------------------------------------------------------------
# landmarker classifiers
# ---------------------------------------------------------------------


def lda_fit_predict(Xtr, ytr, Xte) -> np.ndarray:
    """LDA with pooled covariance (pinv-regularized)."""
    classes = np.unique(ytr)
    n, d = Xtr.shape
    means = np.array([Xtr[ytr == c].mean(axis=0) for c in classes])
    pooled = np.zeros((d, d))
    for c, mu in zip(classes, means):
        Xc = Xtr[ytr == c] - mu
        pooled += Xc.T @ Xc
    pooled /= max(n - classes.size, 1)
    pooled += 1e-9 * np.eye(d)
    prec = np.linalg.pinv(pooled)
    priors = np.array([np.mean(ytr == c) for c in classes])
    scores = np.empty((Xte.shape[0], classes.size))
    for j, (mu, pi) in enumerate(zip(means, priors)):
        w = prec @ mu
        b = -0.5 * mu @ w + np.log(pi)
        scores[:, j] = Xte @ w + b
    return classes[np.argmax(scores, axis=1)]


def gnb_fit_predict(Xtr, ytr, Xte) -> np.ndarray:
    """Gaussian naive Bayes (sklearn var_smoothing=1e-9 semantics)."""
    classes = np.unique(ytr)
    eps = 1e-9 * Xtr.var(axis=0).max()
    loglik = np.empty((Xte.shape[0], classes.size))
    for j, c in enumerate(classes):
        Xc = Xtr[ytr == c]
        mu = Xc.mean(axis=0)
        var = Xc.var(axis=0) + eps
        prior = np.log(Xc.shape[0] / Xtr.shape[0])
        ll = -0.5 * np.sum(
            np.log(2 * np.pi * var) + (Xte - mu) ** 2 / var, axis=1
        )
        loglik[:, j] = ll + prior
    return classes[np.argmax(loglik, axis=1)]


def one_nn_fit_predict(Xtr, ytr, Xte) -> np.ndarray:
    """1-nearest-neighbor, euclidean."""
    aa = (Xte * Xte).sum(axis=1)[:, None]
    bb = (Xtr * Xtr).sum(axis=1)[None, :]
    d2 = aa + bb - 2.0 * Xte @ Xtr.T
    return ytr[np.argmin(d2, axis=1)]


# ---------------------------------------------------------------------
# graph / distance helpers for the complexity group
# ---------------------------------------------------------------------


def gower_norm_dist(N: np.ndarray) -> np.ndarray:
    """Gower distance on 0-1-scaled numeric data, normalized to [0,1]
    (the reference's _calc_norm_dist_mat default,
    /root/reference/pymfe/complexity.py:450-497)."""
    mn, mx = N.min(axis=0), N.max(axis=0)
    rng = np.where(mx > mn, mx - mn, 1.0)
    S = (N - mn) / rng
    n, d = S.shape
    D = np.zeros((n, n))
    for f in range(d):
        D += np.abs(S[:, f][:, None] - S[:, f][None, :])
    D /= d
    ptp = D.max() - D.min()
    if ptp > 0:
        D = (D - D.min()) / ptp
    return D


def minimum_spanning_tree_edges(D: np.ndarray) -> list[tuple[int, int]]:
    """Prim's MST over a dense distance matrix -> edge list."""
    n = D.shape[0]
    if n < 2:
        return []
    in_tree = np.zeros(n, dtype=bool)
    in_tree[0] = True
    best_dist = D[0].copy()
    best_from = np.zeros(n, dtype=int)
    edges = []
    for _ in range(n - 1):
        best_dist_masked = np.where(in_tree, np.inf, best_dist)
        j = int(np.argmin(best_dist_masked))
        edges.append((int(best_from[j]), j))
        in_tree[j] = True
        closer = D[j] < best_dist
        best_dist = np.where(closer, D[j], best_dist)
        best_from = np.where(closer, j, best_from)
    return edges


# ---------------------------------------------------------------------
# linear SVM + interpolation + hypersphere / graph helpers for the
# complexity group (l1-l3, n4, t1, density/cls_coef/hubs)
# ---------------------------------------------------------------------


def scale_minmax(N: np.ndarray) -> np.ndarray:
    """Min-max scale each feature to [0, 1]
    (/root/reference/pymfe/complexity.py:717 _scale_N)."""
    mn, mx = N.min(axis=0), N.max(axis=0)
    rng = np.where(mx > mn, mx - mn, 1.0)
    return (N - mn) / rng


def gower_cross_dist(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Gower distance between two all-numeric matrices: mean per-feature
    abs difference scaled by the union range (gower.gower_matrix(A, B)
    semantics for numeric-only data, used by ft_n4,
    /root/reference/pymfe/complexity.py:1944-1951)."""
    lo = np.minimum(A.min(axis=0), B.min(axis=0))
    hi = np.maximum(A.max(axis=0), B.max(axis=0))
    rng = np.where(hi > lo, hi - lo, 1.0)
    As, Bs = (A - lo) / rng, (B - lo) / rng
    D = np.zeros((A.shape[0], B.shape[0]))
    for f in range(As.shape[1]):
        D += np.abs(As[:, f][:, None] - Bs[:, f][None, :])
    return D / As.shape[1]


def linear_svm_fit(X: np.ndarray, y_bin: np.ndarray, C: float = 2.0,
                   n_iter: int = 300):
    """Deterministic full-batch Pegasos-style hinge-loss linear SVM with
    internal standardization.

    n_iter=300: iris-golden l1 stays within 2e-4 of the published value
    (tolerance 1e-3) while the ovo SVM — ~80% of the complexity group's
    kernel time — runs 1.7x faster than at 500.

    Stand-in for the reference's StandardScaler + LinearSVC(penalty=l2,
    loss=hinge, C=2.0) pipeline (/root/reference/pymfe/complexity.py:
    170-229): same objective (0.5||w||^2 + C * sum hinge), different
    solver (liblinear dual coordinate descent is not reproduced; the
    full-batch subgradient path is deterministic with no RNG, which the
    engine needs for partition-order-independent results). Bias handled
    as an appended constant feature (regularized — minor deviation).
    """
    mu = X.mean(axis=0)
    sd = X.std(axis=0)
    sd = np.where(sd > 0, sd, 1.0)
    Xs = np.hstack([(X - mu) / sd, np.ones((X.shape[0], 1))])
    yy = np.where(np.asarray(y_bin, dtype=bool), 1.0, -1.0)
    n, d = Xs.shape
    lam = 1.0 / (C * n)
    w = np.zeros(d)
    for t in range(1, n_iter + 1):
        eta = 1.0 / (lam * t)
        viol = yy * (Xs @ w) < 1.0
        grad = lam * w - (yy[viol, None] * Xs[viol]).sum(axis=0) / n
        w = w - eta * grad
    return mu, sd, w


def linear_svm_decision(model, X: np.ndarray) -> np.ndarray:
    """Signed distance-like decision values of :func:`linear_svm_fit`."""
    mu, sd, w = model
    Xs = np.hstack([(X - mu) / sd, np.ones((X.shape[0], 1))])
    return Xs @ w


def interpolate_within_class(N: np.ndarray, y: np.ndarray,
                             cls_inds: np.ndarray,
                             rng: np.random.RandomState):
    """New dataset of same shape: each class block replaced by random
    convex combinations of pairs drawn (with replacement) from that
    class (/root/reference/pymfe/complexity.py:646-699 _interpolate;
    seeded RandomState instead of the global np.random state so results
    are partition-order independent)."""
    N_out = np.zeros_like(N)
    y_out = np.zeros_like(y)
    pos = 0
    for mask in cls_inds:
        blk = N[mask, :]
        m = blk.shape[0]
        a = blk[rng.choice(m, m), :]
        b = blk[rng.choice(m, m), :]
        t = rng.random_sample(blk.shape)
        nxt = pos + m
        N_out[pos:nxt, :] = a + (b - a) * t
        y_out[pos:nxt] = y[mask]
        pos = nxt
    return N_out, y_out


def nearest_enemies(D: np.ndarray, cls_inds: np.ndarray):
    """Per-instance distance to and index of the nearest other-class
    instance (/root/reference/pymfe/complexity.py:687-716)."""
    n = D.shape[0]
    en_dist = np.full(n, np.inf)
    en_ind = np.full(n, -1, dtype=int)
    for mask in cls_inds:
        friends = np.flatnonzero(mask)
        foes = np.flatnonzero(~mask)
        if friends.size == 0 or foes.size == 0:
            continue
        sub = D[np.ix_(foes, friends)]
        best = foes[np.argmin(sub, axis=0)]
        en_ind[friends] = best
        en_dist[friends] = D[best, friends]
    return en_dist, en_ind


def hypersphere_radii(ne_dist: np.ndarray, ne_ind: np.ndarray) -> np.ndarray:
    """Radius per instance of the T1 hypersphere cover, iterative
    version of the reference's recursion
    (/root/reference/pymfe/complexity.py:2166-2199): mutual enemies get
    half their distance; otherwise r_i = |d_i - r_enemy|, with an
    in-progress sentinel of 0.0 breaking enemy cycles exactly like the
    recursive formulation (iterative so a 4096-turn chain cannot
    overflow the Python stack)."""
    n = ne_ind.size
    radius = np.full(n, -1.0)
    pending = np.zeros(n, dtype=bool)
    for start in range(n):
        if radius[start] >= 0.0:
            continue
        stack = [start]
        while stack:
            i = stack[-1]
            if pending[i]:
                # enemy radius now available (or a cycle sentinel 0.0)
                radius[i] = abs(ne_dist[i] - radius[ne_ind[i]])
                pending[i] = False
                stack.pop()
                continue
            if radius[i] >= 0.0:
                stack.pop()
                continue
            e = ne_ind[i]
            if ne_ind[e] == i:
                radius[i] = radius[e] = 0.5 * ne_dist[i]
                stack.pop()
                continue
            pending[i] = True
            radius[i] = 0.0  # cycle sentinel, mirrors the reference
            if radius[e] < 0.0:
                stack.append(e)
    return radius


def same_class_knn_adjacency(D: np.ndarray, cls_inds: np.ndarray,
                             radius_frac: float = 0.15) -> np.ndarray:
    """Symmetric weighted adjacency of the same-class k-NN graph
    (/root/reference/pymfe/complexity.py:498-551
    _build_adjacency_graph): k = round(n * radius_frac) nearest
    neighbors per instance (distance weights, no self), cross-class
    edges dropped, symmetrized with element-wise max."""
    n = D.shape[0]
    k = int(round(n * radius_frac)) if 0 < radius_frac < 1.0 else int(radius_frac)
    k = max(k, 1)
    k = min(k, n - 1)
    adj = np.zeros((n, n))
    Dx = D.copy()
    np.fill_diagonal(Dx, np.inf)
    order = np.argsort(Dx, axis=1, kind="stable")[:, :k]
    rows = np.repeat(np.arange(n), k)
    cols = order.ravel()
    adj[rows, cols] = D[rows, cols]
    for mask in cls_inds:
        adj[np.ix_(mask, ~mask)] = 0.0
    return np.maximum(adj, adj.T)


def graph_density(adj: np.ndarray) -> float:
    """Edge count / possible edges of the undirected simple graph whose
    edges are the nonzero adjacency entries (igraph Graph.density)."""
    n = adj.shape[0]
    if n < 2:
        return float("nan")
    edges = int(np.count_nonzero(np.triu(adj, k=1)))
    return edges / (n * (n - 1) / 2.0)


def graph_transitivity(adj: np.ndarray) -> float:
    """Global clustering coefficient 3*triangles/triples of the
    unweighted graph, 0 when no connected triples exist (igraph
    transitivity_undirected(mode="zero"))."""
    A = (adj > 0).astype(float)
    np.fill_diagonal(A, 0.0)
    closed = float(np.trace(A @ A @ A))  # 6 * triangles
    deg = A.sum(axis=1)
    triples = float((deg * (deg - 1.0)).sum())  # 2 * connected triples
    if triples <= 0:
        return 0.0
    return closed / triples


def graph_hub_scores(adj: np.ndarray) -> np.ndarray:
    """Kleinberg hub scores: principal eigenvector of W·Wᵀ (= of W for
    symmetric W), non-negative, normalized to max 1 (igraph
    hub_score)."""
    if adj.size == 0 or not np.any(adj):
        return np.zeros(adj.shape[0])
    vals, vecs = np.linalg.eigh(adj)
    v = np.abs(vecs[:, int(np.argmax(np.abs(vals)))])
    mx = v.max()
    return v / mx if mx > 0 else v
