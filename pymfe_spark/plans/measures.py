"""Arrow-tier measure kernels — pure-numpy re-implementations of the
reference's ft_* measures, executed per conversation batch inside
``applyInPandas`` (zero per-row Python; one Arrow batch per conv).

The sandbox has no scipy/sklearn, so every kernel is written from the
published formulas; reference citations mark the parity target.
Deviations (documented):

- ``nr_norm`` (no longer a deviation): Shapiro-Wilk / D'Agostino /
  Anderson-Darling implemented from the published algorithms in
  plans/normality.py, golden-verified per method against the
  reference's own expectations. Same head-5000 row cap.
- ``can_cor`` uses classical eigen-CCA instead of sklearn's NIPALS CCA
  (statistical.py:211-262) — identical canonical correlations at
  convergence.
- ``sd_ratio`` replicates the reference's Box's M verbatim INCLUDING
  its np.flip(axis=(0,1)) of the covariance stack (statistical.py:
  1222-1230) — the row-only flip negates dets for p % 4 in {2, 3},
  which is why the reference's own mixed/categorical sd_ratio goldens
  are NaN; the engine matches that contract.

Shared intermediates (class masks, distance matrices, crosstabs) are
computed once per batch and threaded through the kernels — the engine
analogue of the reference's precompute cache
(/root/reference/pymfe/_internal.py:1169-1335).

Every kernel is exception-contained: failure -> NaN, never task failure
(mirrors _internal.py:568-621).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

import numpy as np

EPS = 1e-8  # info_theory.py:184-195 crosstab smoothing


# ---------------------------------------------------------------------
# batch container with lazy shared precomputations
# ---------------------------------------------------------------------


@dataclass
class ConvBatch:
    """One conversation's views: N (numeric), C (categorical), y.

    Mirrors the reference's X -> N/C/y split (mfe.py:740-902):
    N columns: text_len, ts_delta_s (first-turn 0), turn_idx.
    C columns: role, tool ('NONE' for null), equal-freq-binned text_len.
    y: role.
    """

    N: np.ndarray  # (n, d_num) float
    C: np.ndarray  # (n, d_cat) object
    y: np.ndarray  # (n,) object
    _cache: dict = field(default_factory=dict)
    # leading C columns that are ORIGINAL attributes (the rest are
    # derived discretizations, like the reference's transform_num
    # output, which belongs to the C view but not to X); None = all.
    # Measures defined over X (e.g. sparsity, statistical.py:1368-1408)
    # read N plus only these columns.
    orig_cat: int | None = None
    # leading N columns that are ORIGINAL attributes (the rest are
    # transform_cat encodings, mfe.py:877-897, which belong to the N
    # view but not to X); None = all.
    orig_num: int | None = None
    # per-extraction knobs read by config-sensitive kernels
    # (num_cv_folds / lm_sample_frac / score for landmarking,
    # measure kwargs like nr_cor_attr's threshold) — the engine
    # analogue of the reference's kwargs routing
    # (/root/reference/pymfe/mfe.py:1208-1218, build_mtd_kwargs
    # _internal.py:624-708)
    config: dict = field(default_factory=dict)

    # --- shared precomputations (computed once, reused) ---

    def classes(self) -> tuple[np.ndarray, np.ndarray]:
        if "classes" not in self._cache:
            self._cache["classes"] = np.unique(self.y, return_counts=True)
        return self._cache["classes"]

    def cls_inds(self) -> np.ndarray:
        if "cls_inds" not in self._cache:
            classes, _ = self.classes()
            self._cache["cls_inds"] = np.array(
                [self.y == c for c in classes]
            )
        return self._cache["cls_inds"]

    def dist_mat(self) -> np.ndarray:
        """Euclidean all-pairs distance matrix of raw N
        (clustering.py:105-215 precompute_group_distances)."""
        if "dist_mat" not in self._cache:
            self._cache["dist_mat"] = _cdist(self.N, self.N)
        return self._cache["dist_mat"]

    def concept_dist_mat(self) -> np.ndarray:
        """Euclidean distances of 0-1 min-max-scaled N
        (concept.py:56-97 precompute_concept_dist)."""
        if "concept_dist" not in self._cache:
            X = self.N
            mn, mx = X.min(axis=0), X.max(axis=0)
            rng = np.where(mx > mn, mx - mn, 1.0)
            Xs = (X - mn) / rng
            self._cache["concept_dist"] = _cdist(Xs, Xs)
        return self._cache["concept_dist"]

    def cov_mat(self) -> np.ndarray:
        if "cov" not in self._cache:
            self._cache["cov"] = np.cov(self.N, rowvar=False, ddof=1)
        return self._cache["cov"]

    def corr_mat(self) -> np.ndarray:
        if "corr" not in self._cache:
            with np.errstate(all="ignore"):
                self._cache["corr"] = np.corrcoef(self.N, rowvar=False)
        return self._cache["corr"]

    def can_cors(self) -> np.ndarray:
        if "can_cors" not in self._cache:
            self._cache["can_cors"] = _can_cors(self.N, self.y)
        return self._cache["can_cors"]

    def can_cor_eigvals(self) -> np.ndarray:
        """lambda = rho^2 / (1 - rho^2) (statistical.py:192-209)."""
        rho = self.can_cors()
        rho2 = np.clip(rho**2, 0.0, 1.0 - 1e-12)
        return rho2 / (1.0 - rho2)

    def c_codes(self, j: int) -> tuple[np.ndarray, np.ndarray]:
        """Cached np.unique factorization (values, inverse codes) of
        C[:, j]. Every info-theory entropy/crosstab reuses it instead
        of re-sorting the column per measure call — the kernel-local
        analogue of the reference's precompute_attr cache
        (info_theory.py:56-155). With ~130 attr_conc pairs plus the
        per-column entropy family, the repeated np.unique sort was the
        single hottest line of the whole Arrow kernel."""
        key = ("ccodes", j)
        if key not in self._cache:
            self._cache[key] = np.unique(self.C[:, j], return_inverse=True)
        return self._cache[key]

    def y_codes(self) -> tuple[np.ndarray, np.ndarray]:
        if "ycodes" not in self._cache:
            self._cache["ycodes"] = np.unique(self.y, return_inverse=True)
        return self._cache["ycodes"]

    def NT(self) -> np.ndarray:
        """Contiguous transpose of N, cached. The whole per-column
        statistical tier reduces along the LAST axis of this array:
        for a C-contiguous (d, n) array numpy applies its pairwise
        reduction per output element, so ``NT.mean(axis=1)[j]`` is
        bit-identical to ``np.mean(N[:, j])`` — one vectorized call
        replaces d small-array calls without changing a single bit.
        (Reducing axis=0 of N instead would accumulate sequentially
        across rows — different rounding — which is why the transpose,
        not an axis flip, is the cacheable form.)"""
        if "NT" not in self._cache:
            self._cache["NT"] = np.ascontiguousarray(self.N.T)
        return self._cache["NT"]

    def n_sorted(self) -> np.ndarray:
        """Per-column sort of N as sorted rows of NT, cached — shared
        by t_mean and the distinct-count measures (sparsity, nr_bin)."""
        if "nsort" not in self._cache:
            self._cache["nsort"] = np.sort(self.NT(), axis=1)
        return self._cache["nsort"]


def _cdist(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Euclidean cdist via the expanded-square identity."""
    aa = (A * A).sum(axis=1)[:, None]
    bb = (B * B).sum(axis=1)[None, :]
    sq = aa + bb - 2.0 * (A @ B.T)
    np.maximum(sq, 0.0, out=sq)
    return np.sqrt(sq)


def _entropy(counts: np.ndarray, base: float | None = None) -> float:
    """Shannon entropy of a count vector. base=None -> natural log
    (scipy.stats.entropy default, info_theory.py:158-180 uses base=2)."""
    p = counts / counts.sum()
    p = p[p > 0]
    h = float(-(p * np.log(p)).sum())
    return h / np.log(base) if base else h


def _tab_from_codes(
    ai: np.ndarray, na: int, bi: np.ndarray, nb: int
) -> np.ndarray:
    """Dense normalized contingency table from precomputed inverse
    codes. bincount of the flattened pair index builds the same
    integer-valued table as an element-wise scatter-add; every count
    and the total are integers represented exactly in float64, so the
    normalized table is bit-identical to the unique()-per-call form."""
    tab = np.bincount(ai * nb + bi, minlength=na * nb).astype(float)
    tab = tab.reshape(na, nb)
    return tab / tab.sum()


def _crosstab_probs(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Dense normalized contingency table (zero cells included)."""
    av, ai = np.unique(a, return_inverse=True)
    bv, bi = np.unique(b, return_inverse=True)
    return _tab_from_codes(ai, av.size, bi, bv.size)


def _joint_ent_tab(ptab: np.ndarray) -> float:
    """eps-smoothed joint entropy over the DENSE crosstab
    (info_theory.py:183-195,457-508): scipy.stats.entropy(p + eps,
    base=2) — normalizes internally."""
    p = ptab.ravel() + EPS
    p = p / p.sum()
    return float(-(p * np.log2(p)).sum())


def _joint_ent(a: np.ndarray, b: np.ndarray) -> float:
    return _joint_ent_tab(_crosstab_probs(a, b))


def _counts_from_codes(vals: np.ndarray, inv: np.ndarray) -> np.ndarray:
    return np.bincount(inv, minlength=vals.size)


def _col_ent(col: np.ndarray) -> float:
    _, cnt = np.unique(col, return_counts=True)
    return _entropy(cnt, base=2)


def _conc_tab(pij: np.ndarray, eps: float = 1.0e-8) -> float:
    """Goodman-Kruskal tau from a normalized crosstab (rows = a,
    cols = b), reference-exact (info_theory.py:198-213): eps added to
    every cell, numerator divides by the b-marginals and subtracts the
    squared a-marginals."""
    pij = pij + eps
    isum = pij.sum(axis=0)
    jsum2 = float((pij.sum(axis=1) ** 2).sum())
    denom = 1.0 - jsum2
    if denom == 0:
        return float("nan")
    with np.errstate(invalid="ignore", divide="ignore"):
        num = float((pij**2 / isum).sum()) - jsum2
    return float(num / denom)


def _conc(a: np.ndarray, b: np.ndarray, eps: float = 1.0e-8) -> float:
    """Goodman-Kruskal tau of a -> b (crosstab built per call; the
    measure kernels use the code-cached path instead)."""
    return _conc_tab(_crosstab_probs(a, b), eps)


def _can_cors(N: np.ndarray, y: np.ndarray, reg: float = 1e-10) -> np.ndarray:
    """Classical CCA between N and one-hot(y) (k-1 components dropped by
    rank): canonical correlations are the singular values of
    Sxx^-1/2 Sxy Syy^-1/2."""
    classes = np.unique(y)
    if classes.size < 2 or N.shape[0] < 3:
        return np.array([])
    Y = (y[:, None] == classes[None, :]).astype(float)
    Xc = N - N.mean(axis=0)
    Yc = Y - Y.mean(axis=0)
    n = N.shape[0]
    Sxx = Xc.T @ Xc / (n - 1) + reg * np.eye(Xc.shape[1])
    Syy = Yc.T @ Yc / (n - 1) + reg * np.eye(Yc.shape[1])
    Sxy = Xc.T @ Yc / (n - 1)

    def inv_sqrt(S):
        w, V = np.linalg.eigh(S)
        w = np.clip(w, reg, None)
        return V @ np.diag(w**-0.5) @ V.T

    M = inv_sqrt(Sxx) @ Sxy @ inv_sqrt(Syy)
    s = np.linalg.svd(M, compute_uv=False)
    k = min(classes.size, N.shape[1])
    s = s[:k]
    # trim rank-deficient components (one-hot Y has rank k-1): the
    # reference's CCA while-loop stops at the first zero-variance
    # transformed column (statistical.py:246-257); the eigen route
    # surfaces those as ~reg-level singular values
    s = s[s > 1.0e-8]
    return np.clip(s, 0.0, 1.0)


# ---------------------------------------------------------------------
# measure registry
# ---------------------------------------------------------------------

MeasureFn = Callable[[ConvBatch], "float | np.ndarray"]


@dataclass(frozen=True)
class MeasureDef:
    name: str
    group: str
    fn: MeasureFn
    needs_y: bool = False


MEASURES: dict[str, MeasureDef] = {}


GROUPS: dict[str, list[str]] = {}


def measure(name: str, group: str, needs_y: bool = False):
    def deco(fn: MeasureFn) -> MeasureFn:
        MEASURES[name] = MeasureDef(name, group, fn, needs_y)
        GROUPS.setdefault(group, []).append(name)
        return fn

    return deco


# ---- general (/root/reference/pymfe/general.py) ----------------------


def _d_cat(b: ConvBatch) -> int:
    """#ORIGINAL categorical attributes: the reference's attribute-count
    measures are defined over X (general.py:212-231 et al.), so derived
    discretizations (transform_num output; engine: len_bin) belong to
    the C *view* but not to the attribute counts."""
    return b.C.shape[1] if b.orig_cat is None else b.orig_cat


def _d_num(b: ConvBatch) -> int:
    """#ORIGINAL numeric attributes (transform_cat encodings belong to
    the N view but not to X — mfe.py:877-897)."""
    return b.N.shape[1] if b.orig_num is None else b.orig_num


measure("nr_inst", "general")(lambda b: float(b.N.shape[0]))  # 318-337
measure("nr_attr", "general")(lambda b: float(_d_num(b) + _d_cat(b)))  # 212-231
measure("nr_num", "general")(lambda b: float(_d_num(b)))  # 340-364
measure("nr_cat", "general")(lambda b: float(_d_cat(b)))  # 263-284
measure("attr_to_inst", "general")(
    lambda b: (_d_num(b) + _d_cat(b)) / b.N.shape[0]
)  # 88-110
measure("inst_to_attr", "general")(
    lambda b: b.N.shape[0] / (_d_num(b) + _d_cat(b))
)  # 187-209
measure("cat_to_num", "general")(lambda b: _d_cat(b) / _d_num(b))  # 113-150
measure("num_to_cat", "general")(lambda b: _d_num(b) / _d_cat(b))  # 367-405
measure("nr_class", "general", needs_y=True)(
    lambda b: float(np.unique(b.y).size)
)  # 287-315


@measure("freq_class", "general", needs_y=True)
def _freq_class(b: ConvBatch) -> np.ndarray:
    """Relative class frequencies (general.py:153-184) — vector,
    summarized downstream."""
    _, cnt = b.classes()
    return cnt / cnt.sum()


def _sorted_distinct(s: np.ndarray) -> int:
    """Distinct count of a SORTED float vector, matching
    np.unique's NaN handling (all NaNs collapse to one; sort places
    them at the end)."""
    if s.size == 0:
        return 0
    nn = s[~np.isnan(s)]
    d = (int((nn[1:] != nn[:-1]).sum()) + 1) if nn.size else 0
    return d + int(nn.size < s.size)


@measure("nr_bin", "general")
def _nr_bin(b: ConvBatch) -> float:
    """#columns with exactly 2 distinct values (general.py:234-260) —
    defined over X, so only original attributes count (see _d_cat).
    Distinct counts come from the shared per-column sort / cached
    factorization instead of a fresh np.unique per column."""
    s = b.n_sorted()
    n = 0
    for j in range(_d_num(b)):
        n += int(_sorted_distinct(s[j]) == 2)
    for j in range(_d_cat(b)):
        n += int(b.c_codes(j)[0].size == 2)
    return float(n)


# ---- statistical (/root/reference/pymfe/statistical.py) --------------


def _per_col(fn):
    """Per-column scalar form — kept as the readable truth source for
    tests; the registered measures below are last-axis vectorizations
    over ConvBatch.NT() that produce bit-identical vectors (numpy's
    pairwise/partition reductions act per output element when the
    reduction axis is the last one of a contiguous array)."""
    return lambda b: np.array([fn(b.N[:, j]) for j in range(b.N.shape[1])])


# One vectorized call per measure instead of d small-array calls: at
# ~5 numeric columns x 11 per-column measures the numpy call overhead
# was ~1.6 ms of the ~5 ms fixed per-conversation kernel cost.
measure("mean", "statistical")(lambda b: b.NT().mean(axis=1))  # 794-814
measure("median", "statistical")(
    lambda b: np.median(b.NT(), axis=1)
)  # 817-837
measure("min", "statistical")(lambda b: b.NT().min(axis=1))  # 840-860
measure("max", "statistical")(lambda b: b.NT().max(axis=1))  # 771-791
measure("range", "statistical")(
    lambda b: np.ptp(b.NT(), axis=1)
)  # 1114-1133
measure("sd", "statistical")(
    lambda b: np.std(b.NT(), axis=1, ddof=1)
)  # 1136-1159
measure("var", "statistical")(
    lambda b: np.var(b.NT(), axis=1, ddof=1)
)  # 1439-1462
measure("iq_range", "statistical")(
    lambda b: np.quantile(b.NT(), 0.75, axis=1)
    - np.quantile(b.NT(), 0.25, axis=1)
)  # 659-678
measure("mad", "statistical")(
    lambda b: 1.4826
    * np.median(
        np.abs(b.NT() - np.median(b.NT(), axis=1)[:, None]), axis=1
    )
)  # 741-768


@measure("g_mean", "statistical")
def _g_mean(b: ConvBatch) -> np.ndarray:
    """statistical.py:584-634: negative -> nan, zero -> 0."""
    NT = b.NT()
    mn = NT.min(axis=1)
    with np.errstate(all="ignore"):
        gm = np.exp(np.mean(np.log(NT), axis=1))
    return np.where(mn < 0, np.nan, np.where(mn == 0, 0.0, gm))


@measure("h_mean", "statistical")
def _h_mean(b: ConvBatch) -> np.ndarray:
    """statistical.py:637-656."""
    NT = b.NT()
    with np.errstate(all="ignore"):
        return NT.shape[1] / (1.0 / NT).sum(axis=1)


@measure("t_mean", "statistical")
def _t_mean(b: ConvBatch) -> np.ndarray:
    """20%-trimmed mean (statistical.py:1411-1436)."""
    s = b.n_sorted()
    n = s.shape[1]
    k = int(np.floor(n * 0.2))
    if n - 2 * k <= 0:
        return np.full(s.shape[0], np.nan)
    return s[:, k : n - k].mean(axis=1)


def _skew_m3(v: np.ndarray) -> float:
    n = v.size
    m2 = ((v - v.mean()) ** 2).mean()
    if m2 == 0 or n < 2:
        return float("nan")
    g1 = ((v - v.mean()) ** 3).mean() / m2**1.5
    return float(g1 * ((n - 1) / n) ** 1.5)


def _kurt_m3(v: np.ndarray) -> float:
    n = v.size
    m2 = ((v - v.mean()) ** 2).mean()
    if m2 == 0 or n < 2:
        return float("nan")
    g2 = ((v - v.mean()) ** 4).mean() / m2**2 - 3.0
    return float((g2 + 3.0) * (1.0 - 1.0 / n) ** 2 - 3.0)


def _central_moments(b: ConvBatch) -> tuple[np.ndarray, ...]:
    """(m2, m3, m4) per column from one shared centered array — the
    skew/kurt pair recomputed these independently per column before.
    Each ``.mean(axis=1)`` reduces the last axis, so every moment is
    bit-identical to the per-column scalar form."""
    if "cmoments" not in b._cache:
        NT = b.NT()
        d0 = NT - NT.mean(axis=1)[:, None]
        # keep the original's `x ** p` ufuncs: pow() and unrolled
        # multiplication can differ in the last ulp
        b._cache["cmoments"] = (
            (d0**2).mean(axis=1),
            (d0**3).mean(axis=1),
            (d0**4).mean(axis=1),
        )
    return b._cache["cmoments"]


@measure("skewness", "statistical")
def _skewness(b: ConvBatch) -> np.ndarray:  # 1310-1365
    n = b.N.shape[0]
    m2, m3, _ = _central_moments(b)
    if n < 2:
        return np.full(m2.shape, np.nan)
    # final scalar math per column: numpy's VECTOR pow ufunc (SIMD)
    # rounds m2**1.5 differently from the scalar np.float64 pow by
    # 1 ulp, so the tail stays in scalar form to match _skew_m3 bitwise
    return np.array(
        [
            (
                float("nan")
                if m2[j] == 0
                else float(m3[j] / m2[j] ** 1.5 * ((n - 1) / n) ** 1.5)
            )
            for j in range(m2.size)
        ]
    )


@measure("kurtosis", "statistical")
def _kurtosis(b: ConvBatch) -> np.ndarray:  # 681-738
    n = b.N.shape[0]
    m2, _, m4 = _central_moments(b)
    if n < 2:
        return np.full(m2.shape, np.nan)
    return np.array(
        [
            (
                float("nan")
                if m2[j] == 0
                else float(
                    (m4[j] / m2[j] ** 2 - 3.0 + 3.0)
                    * (1.0 - 1.0 / n) ** 2
                    - 3.0
                )
            )
            for j in range(m2.size)
        ]
    )


@measure("sparsity", "statistical")
def _sparsity(b: ConvBatch) -> np.ndarray:
    """(n/d - 1)/(n - 1) per ORIGINAL attribute — statistical.py:
    1368-1408 operates on X, so derived columns (reference:
    transform_num/transform_cat output; engine: len_bin and encoded
    role/tool) are excluded."""
    n = b.N.shape[0]
    if n <= 1:
        return np.full(_d_num(b) + _d_cat(b), np.nan)
    s = b.n_sorted()
    vals = []
    for j in range(_d_num(b)):
        d = _sorted_distinct(s[j])
        vals.append((n / d - 1.0) / (n - 1.0))
    for j in range(_d_cat(b)):
        d = b.c_codes(j)[0].size
        vals.append((n / d - 1.0) / (n - 1.0))
    return np.array(vals)


@measure("nr_outliers", "statistical")
def _nr_outliers(b: ConvBatch) -> float:
    """#columns with a boxplot (whis=1.5) outlier (statistical.py:
    1068-1111)."""
    NT = b.NT()
    q1, q3 = np.quantile(NT, (0.25, 0.75), axis=1)
    iqr = q3 - q1
    out = (NT.min(axis=1) < q1 - 1.5 * iqr) | (
        NT.max(axis=1) > q3 + 1.5 * iqr
    )
    return float(out.sum())


@measure("cor", "statistical")
def _cor(b: ConvBatch) -> np.ndarray:
    """abs lower triangle of corr matrix (statistical.py:410-450)."""
    C = np.abs(b.corr_mat())
    return C[np.tril_indices_from(C, k=-1)]


@measure("cov", "statistical")
def _cov(b: ConvBatch) -> np.ndarray:
    """abs lower triangle of covariance (statistical.py:453-498)."""
    C = np.abs(b.cov_mat())
    return C[np.tril_indices_from(C, k=-1)]


@measure("nr_cor_attr", "statistical")
def _nr_cor_attr(b: ConvBatch) -> float:
    """fraction of pairs with |rho| >= threshold (statistical.py:
    863-915; default 0.5, overridable via measure_kwargs routing —
    the reference's ``extract(nr_cor_attr={"threshold": ...})``)."""
    thr = (
        b.config.get("measure_kwargs", {})
        .get("nr_cor_attr", {})
        .get("threshold", 0.5)
    )
    v = np.abs(b.corr_mat())[np.tril_indices(b.N.shape[1], k=-1)]
    return float(np.mean(v >= thr)) if v.size else float("nan")


@measure("eigenvalues", "statistical")
def _eigenvalues(b: ConvBatch) -> np.ndarray:
    """eigvals of the covariance matrix (statistical.py:547-581)."""
    return np.linalg.eigvalsh(b.cov_mat())[::-1]


@measure("gravity", "statistical", needs_y=True)
def _gravity(b: ConvBatch) -> float:
    """Distance between majority and minority class centroids
    (statistical.py:305-407); deterministic tie-break by class label."""
    classes, cnt = b.classes()
    if classes.size < 2:
        return float("nan")
    maj = classes[np.lexsort((classes, -cnt))][0]
    rest = classes != maj
    mino = classes[rest][np.lexsort((classes[rest], cnt[rest]))][0]
    ca = b.N[b.y == maj].mean(axis=0)
    cb = b.N[b.y == mino].mean(axis=0)
    return float(np.linalg.norm(ca - cb))


@measure("nr_norm", "statistical")
def _nr_norm(b: ConvBatch) -> float:
    """#columns passing a normality test over the first 5000 rows
    (statistical.py:918-1065; row cap 970-976; default method
    shapiro-wilk as in the reference). All three reference tests —
    Shapiro-Wilk (AS R94), D'Agostino-Pearson K², Anderson-Darling —
    are pure-numpy in plans/normality.py and golden-verified against
    the reference's own per-method iris/mix/kr expectations, including
    its percent-vs-fraction significance-pick quirk for
    anderson-darling. Per-column test failures (n too small, constant
    column) propagate, matching apply_along_axis semantics -> the
    measure becomes NaN via exception containment. method / threshold /
    failure / max_samples route through measure_kwargs like the
    reference's extract(nr_norm={...})."""
    from pymfe_spark.plans.normality import nr_norm as _nn

    kw = b.config.get("measure_kwargs", {}).get("nr_norm", {})
    return _nn(
        b.N.astype(float),
        method=kw.get("method", "shapiro-wilk"),
        threshold=kw.get("threshold", 0.05),
        failure=kw.get("failure", "soft"),
        max_samples=kw.get("max_samples", 5000),
    )


@measure("can_cor", "statistical", needs_y=True)
def _can_cor(b: ConvBatch) -> np.ndarray:
    return b.can_cors()  # statistical.py:265-302


@measure("nr_disc", "statistical", needs_y=True)
def _nr_disc(b: ConvBatch) -> float:
    return float(b.can_cors().size)  # statistical.py:501-544


@measure("w_lambda", "statistical", needs_y=True)
def _w_lambda(b: ConvBatch) -> float:
    """Wilks' Lambda via exp(-sum(log1p(eig))) — the reference's
    numerically-stable rewrite (statistical.py:1537-1538)."""
    ev = b.can_cor_eigvals()
    return float(np.exp(-np.sum(np.log1p(ev)))) if ev.size else float("nan")


@measure("p_trace", "statistical", needs_y=True)
def _p_trace(b: ConvBatch) -> float:
    rho = b.can_cors()
    return float(np.sum(rho**2)) if rho.size else float("nan")  # 1541-1582


@measure("lh_trace", "statistical", needs_y=True)
def _lh_trace(b: ConvBatch) -> float:
    ev = b.can_cor_eigvals()
    return float(np.sum(ev)) if ev.size else float("nan")  # 1585-1658


@measure("roy_root", "statistical", needs_y=True)
def _roy_root(b: ConvBatch) -> float:
    ev = b.can_cor_eigvals()
    return float(np.max(ev)) if ev.size else float("nan")  # 1661-1774


@measure("sd_ratio", "statistical", needs_y=True)
def _sd_ratio(b: ConvBatch) -> float:
    """Box's M homogeneity-of-covariances statistic
    (statistical.py:1162-1307): exp(M / (p * (n - k)))."""
    classes, cnt = b.classes()
    k = classes.size
    n, p = b.N.shape
    if k < 2 or np.any(cnt < 2):
        return float("nan")
    covs = np.array(
        [np.cov(b.N[b.y == c], rowvar=False, ddof=1) for c in classes]
    )
    # replicated verbatim from the reference (statistical.py:1222-1230):
    # np.flip(axis=(0, 1)) reverses the class order AND each matrix's
    # ROWS (not columns), so every det picks up a (-1)^floor(p/2)
    # factor and the weights pair with the reversed class stack. For
    # p % 4 in {2, 3} the dets go negative -> log -> NaN — the
    # reference's own mixed/categorical goldens pin that NaN, so the
    # quirk is part of the contract.
    covs = np.flip(covs, axis=(0, 1))
    w = cnt - 1.0
    pooled = (w[:, None, None] * covs).sum(axis=0) / (n - k)
    gamma = 1.0 - (
        (2.0 * p**2 + 3.0 * p - 1.0) / (6.0 * (p + 1.0) * (k - 1.0))
    ) * (np.sum(1.0 / w) - 1.0 / (n - k))
    with np.errstate(all="ignore"):
        logdets = [np.log(np.linalg.det(np.atleast_2d(Si))) for Si in covs]
        logdet_p = np.log(np.linalg.det(np.atleast_2d(pooled)))
        m_factor = gamma * ((n - k) * logdet_p - np.dot(w, logdets))
    if not np.isfinite(m_factor):
        return float("nan")
    return float(np.exp(m_factor / (p * (n - k))))


# ---- info-theory (/root/reference/pymfe/info_theory.py) --------------

measure("class_ent", "info-theory", needs_y=True)(
    lambda b: _col_ent(b.y)
)  # 344-389


@measure("attr_ent", "info-theory")
def _attr_ent(b: ConvBatch) -> np.ndarray:
    """Shannon entropy per categorical column (info_theory.py:277-313).
    Cached: reused by mut_inf and ns_ratio (precompute-cache
    analogue); counts come from the cached column factorization."""
    if "attr_ent" not in b._cache:
        b._cache["attr_ent"] = np.array(
            [
                _entropy(_counts_from_codes(*b.c_codes(j)), base=2)
                for j in range(b.C.shape[1])
            ]
        )
    return b._cache["attr_ent"]


def _joint_ent_y_vec(b: ConvBatch) -> np.ndarray:
    """H(col, y) per column — computed once from cached codes, shared
    by joint_ent and mut_inf (the reference computes these twice)."""
    if "joint_ent_y" not in b._cache:
        yv, yi = b.y_codes()
        out = []
        for j in range(b.C.shape[1]):
            cv, ci = b.c_codes(j)
            out.append(_joint_ent_tab(_tab_from_codes(ci, cv.size, yi, yv.size)))
        b._cache["joint_ent_y"] = np.array(out)
    return b._cache["joint_ent_y"]


@measure("joint_ent", "info-theory", needs_y=True)
def _joint_ent_m(b: ConvBatch) -> np.ndarray:
    """Joint entropy of each column with y (info_theory.py:457-508)."""
    return _joint_ent_y_vec(b)


@measure("mut_inf", "info-theory", needs_y=True)
def _mut_inf(b: ConvBatch) -> np.ndarray:
    """H(x) + H(y) - H(x,y) (info_theory.py:511-588). Cached: reused by
    eq_num_attr and ns_ratio. Element order of the float ops matches
    the per-column scalar form: (H(x_j) + H(y)) - H(x_j, y)."""
    if "mut_inf" not in b._cache:
        hy = _col_ent(b.y)
        b._cache["mut_inf"] = (_attr_ent(b) + hy) - _joint_ent_y_vec(b)
    return b._cache["mut_inf"]


@measure("attr_conc", "info-theory")
def _attr_conc(b: ConvBatch) -> np.ndarray:
    """Goodman-Kruskal tau for every ORDERED column pair, max 12 columns
    sampled (info_theory.py:198-274; cap at 219-263). The sample
    replays the reference's seeded np.random.choice stream
    (random_state from the batch config). Emission order is the
    reference's nested-loop order; each unordered pair's crosstab is
    built once and transposed for the reverse direction (the transpose
    is exact — integer scatter counts)."""
    d = b.C.shape[1]
    cols = np.arange(d)
    if d > 12:
        rng = np.random.RandomState(b.config.get("seed", 1234))
        cols = np.sort(rng.choice(d, 12, replace=False))
    tabs: dict[tuple[int, int], np.ndarray] = {}
    out = []
    for i in cols:
        for j in cols:
            if i == j:
                continue
            if (j, i) in tabs:
                tab = tabs.pop((j, i)).T
            else:
                iv, ii = b.c_codes(i)
                jv, ji = b.c_codes(j)
                tab = _tab_from_codes(ii, iv.size, ji, jv.size)
                tabs[(i, j)] = tab
            out.append(_conc_tab(tab))
    return np.array(out) if out else np.array([np.nan])


@measure("class_conc", "info-theory", needs_y=True)
def _class_conc(b: ConvBatch) -> np.ndarray:
    """tau(col -> y) per column (info_theory.py:316-341)."""
    yv, yi = b.y_codes()
    out = []
    for j in range(b.C.shape[1]):
        cv, ci = b.c_codes(j)
        out.append(_conc_tab(_tab_from_codes(ci, cv.size, yi, yv.size)))
    return np.array(out)


@measure("eq_num_attr", "info-theory", needs_y=True)
def _eq_num_attr(b: ConvBatch) -> float:
    """d * H(y) / sum(MI) (info_theory.py:392-454)."""
    mi = _mut_inf(b)
    s = mi.sum()
    return float(b.C.shape[1] * _col_ent(b.y) / s) if s else float("nan")


@measure("ns_ratio", "info-theory", needs_y=True)
def _ns_ratio(b: ConvBatch) -> float:
    """(sum H(x) - sum MI) / sum MI (info_theory.py:591-650)."""
    mi = _mut_inf(b).sum()
    hx = _attr_ent(b).sum()
    return float((hx - mi) / mi) if mi else float("nan")


# ---- clustering (/root/reference/pymfe/clustering.py) ----------------


def _intercls_blocks(b: ConvBatch) -> list[np.ndarray]:
    """Per class pair: cdist block normalized by its size
    (clustering.py:356-400)."""
    D = b.dist_mat()
    inds = b.cls_inds()
    blocks = []
    for i in range(inds.shape[0]):
        for j in range(i + 1, inds.shape[0]):
            blk = D[np.ix_(inds[i], inds[j])]
            blocks.append(blk / blk.size)
    return blocks


@measure("vdu", "clustering", needs_y=True)
def _vdu(b: ConvBatch) -> float:
    """Dunn index: min normalized inter-class dist / max intra-class
    diameter (clustering.py:542-624)."""
    blocks = _intercls_blocks(b)
    if not blocks:
        return float("nan")
    min_inter = min(float(blk.min()) for blk in blocks)
    D = b.dist_mat()
    inds = b.cls_inds()
    intr = [
        float(D[np.ix_(m, m)].max()) for m in inds if m.sum() > 1
    ]
    mx = max(intr) if intr else 0.0
    return float(min_inter / mx) if mx else float("nan")


@measure("int", "clustering", needs_y=True)
def _int_index(b: ConvBatch) -> float:
    """INT index (clustering.py:651-734): sum of normalized inter-class
    dists * 2/(q(q-1))."""
    classes, _ = b.classes()
    q = classes.size
    if q < 2:
        return float("nan")
    total = sum(float(blk.sum()) for blk in _intercls_blocks(b))
    return total * 2.0 / (q * (q - 1.0))


@measure("vdb", "clustering", needs_y=True)
def _vdb(b: ConvBatch) -> float:
    """Davies-Bouldin (sklearn.metrics.davies_bouldin_score semantics,
    clustering.py:627-648): s_i = mean dist to centroid."""
    classes, _ = b.classes()
    if classes.size < 2:
        return float("nan")
    cents, s = [], []
    for c in classes:
        pts = b.N[b.y == c]
        cen = pts.mean(axis=0)
        cents.append(cen)
        s.append(float(np.linalg.norm(pts - cen, axis=1).mean()))
    cents = np.array(cents)
    M = _cdist(cents, cents)
    k = classes.size
    R = np.zeros(k)
    for i in range(k):
        vals = [
            (s[i] + s[j]) / M[i, j] if M[i, j] > 0 else 0.0
            for j in range(k)
            if j != i
        ]
        R[i] = max(vals)
    return float(R.mean())


@measure("ch", "clustering", needs_y=True)
def _ch(b: ConvBatch) -> float:
    """Calinski-Harabasz (clustering.py:851-875)."""
    classes, cnt = b.classes()
    k, n = classes.size, b.N.shape[0]
    if k < 2 or n <= k:
        return float("nan")
    mu = b.N.mean(axis=0)
    ssb = ssw = 0.0
    for c, ni in zip(classes, cnt):
        pts = b.N[b.y == c]
        ci = pts.mean(axis=0)
        ssb += ni * float(((ci - mu) ** 2).sum())
        ssw += float(((pts - ci) ** 2).sum())
    return float((ssb / (k - 1)) / (ssw / (n - k))) if ssw else float("nan")


@measure("sil", "clustering", needs_y=True)
def _sil(b: ConvBatch) -> float:
    """Mean silhouette (sklearn semantics, clustering.py:737-797):
    singleton clusters score 0."""
    D = b.dist_mat()
    classes, cnt = b.classes()
    if classes.size < 2:
        return float("nan")
    inds = b.cls_inds()
    n = b.N.shape[0]
    s = np.zeros(n)
    for idx in range(n):
        own = b.y[idx]
        own_mask = inds[list(classes).index(own)]
        n_own = own_mask.sum()
        if n_own <= 1:
            s[idx] = 0.0
            continue
        a = D[idx, own_mask].sum() / (n_own - 1)
        bvals = [
            D[idx, m].mean() for m, c in zip(inds, classes) if c != own
        ]
        bmin = min(bvals)
        s[idx] = (bmin - a) / max(a, bmin) if max(a, bmin) > 0 else 0.0
    return float(s.mean())


@measure("pb", "clustering", needs_y=True)
def _pb(b: ConvBatch) -> float:
    """Point-biserial corr between pairwise distances and same-class
    indicator (clustering.py:800-848) — Pearson corr with the binary
    x = classes match."""
    D = b.dist_mat()
    iu = np.triu_indices_from(D, k=1)
    dists = D[iu]
    same = (b.y[iu[0]] == b.y[iu[1]]).astype(float)
    if same.std() == 0 or dists.std() == 0:
        return float("nan")
    return float(np.corrcoef(same, dists)[0, 1])


@measure("nre", "clustering", needs_y=True)
def _nre(b: ConvBatch) -> float:
    """Entropy (natural log) of class proportions (clustering.py:878-912)."""
    _, cnt = b.classes()
    return _entropy(cnt)


@measure("sc", "clustering", needs_y=True)
def _sc(b: ConvBatch) -> float:
    """#classes with < 15 instances (clustering.py:915-962)."""
    _, cnt = b.classes()
    return float((cnt < 15).sum())


# ---- concept (/root/reference/pymfe/concept.py) ----------------------


def _concept_weights(b: ConvBatch, alpha: float) -> np.ndarray:
    """weights 2^(-alpha * d / (sqrt(d_cols) - d)) with the reference's
    concept_minimum guard (concept.py:100-172)."""
    D = b.concept_dist_mat()
    div = np.sqrt(b.N.shape[1]) - D
    div[div <= 0] = 10e-10
    w = np.power(2.0, -alpha * (D / div))
    np.fill_diagonal(w, 0.0)
    return w


def _radius_weights(b: ConvBatch, alpha: float) -> np.ndarray:
    """Integer-radius weights 2^(-alpha*ceil(d)), radius 0 -> 1
    (concept.py:240-303)."""
    radius = np.ceil(b.concept_dist_mat()).astype(int)
    radius[radius == 0] = 1
    w = np.power(2.0, -alpha * radius)
    np.fill_diagonal(w, 0.0)
    return w


@measure("conceptvar", "concept", needs_y=True)
def _conceptvar(b: ConvBatch) -> np.ndarray:
    """Per-example weighted class disagreement (concept.py:100-172)."""
    w = _concept_weights(b, alpha=2.0)
    diff = (b.y[:, None] != b.y[None, :]).astype(float)
    with np.errstate(invalid="ignore"):
        return (w * diff).sum(axis=0) / w.sum(axis=0)


@measure("wg_dist", "concept")
def _wg_dist(b: ConvBatch) -> np.ndarray:
    """Per-example weighted mean distance (concept.py:175-237)."""
    w = _concept_weights(b, alpha=2.0)
    D = b.concept_dist_mat()
    with np.errstate(invalid="ignore"):
        return (w * D).sum(axis=0) / w.sum(axis=0)


@measure("impconceptvar", "concept", needs_y=True)
def _impconceptvar(b: ConvBatch) -> np.ndarray:
    """Improved concept variation (concept.py:240-303)."""
    w = _radius_weights(b, alpha=1.0)
    diff = (b.y[:, None] != b.y[None, :]).astype(float)
    return (w * diff).sum(axis=0)


@measure("cohesiveness", "concept")
def _cohesiveness(b: ConvBatch) -> np.ndarray:
    """Sum of radius weights per example (concept.py:306-359)."""
    return _radius_weights(b, alpha=1.0).sum(axis=0)


# ---- itemset (/root/reference/pymfe/itemset.py) ----------------------


def _binarize(C: np.ndarray) -> list[np.ndarray]:
    """One boolean column per (column, value) pair (itemset.py:84-96)."""
    cols = []
    for j in range(C.shape[1]):
        for v in np.unique(C[:, j]):
            cols.append(C[:, j] == v)
    return cols


@measure("one_itemset", "itemset")
def _one_itemset(b: ConvBatch) -> np.ndarray:
    """Per attribute-value support (itemset.py:151-190)."""
    n = b.C.shape[0]
    return np.array([m.sum() / n for m in _binarize(b.C)])


@measure("two_itemset", "itemset")
def _two_itemset(b: ConvBatch) -> np.ndarray:
    """XOR support for value pairs across DIFFERENT original columns
    (itemset.py:99-148)."""
    n = b.C.shape[0]
    per_col = []
    for j in range(b.C.shape[1]):
        per_col.append([b.C[:, j] == v for v in np.unique(b.C[:, j])])
    out = []
    for j1 in range(len(per_col)):
        for j2 in range(j1 + 1, len(per_col)):
            for m1 in per_col[j1]:
                for m2 in per_col[j2]:
                    out.append(float(np.logical_xor(m1, m2).sum()) / n)
    return np.array(out) if out else np.array([np.nan])


DEFAULT_GROUPS = ("general", "statistical", "info-theory")


def all_groups() -> tuple[str, ...]:
    """All registered groups (measures_ml registers more on import)."""
    import pymfe_spark.plans.measures_ml  # noqa: F401  (idempotent)

    return tuple(GROUPS)


# backwards-compat constant: groups registered in THIS module
ALL_GROUPS = tuple(GROUPS)
