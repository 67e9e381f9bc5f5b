"""Per-conversation info-theory / class-balance / clustering-index /
itemset / summary-layer measures — SQL tier (continued from conv_stats).

Parity targets:
- entropies: /root/reference/pymfe/info_theory.py (attr_ent 277-313,
  class_ent 344-389, joint_ent 457-508 with eps=1e-8 dense-crosstab
  smoothing at 183-195, mut_inf 511-588, eq_num_attr 392-454,
  ns_ratio 591-650).
- class balance: complexity.py c1 1966-2004, c2 2005-2045;
  clustering.py nre 878-912, sc 915-962, ch 851-875, vdb 627-648.
- itemset: itemset.py one_itemset 151-190, two_itemset 99-148.
- summary layer: _summary.py histogram 26-59, quantiles 62-143,
  sum/powersum/pnorm 356-444.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pymfe_spark.functions.sql_exprs import r
from pymfe_spark.operators.base import TURNS_SQL, turns
from pymfe_spark.plans.catalog import register
from pymfe_spark.sources import transcripts, with_transcripts_cte

GROUP = "metafeature-sql"

def _conv_w():
    return Window.partitionBy("conv_id")


def _entropy_from_counts(counts: DataFrame, key: str = "conv_id") -> DataFrame:
    """-sum(p*log2 p) over a (key, c) count table -> (key, ent)."""
    p = F.col("c") / F.sum("c").over(Window.partitionBy(key))
    return (
        counts.withColumn("p", p)
        .groupBy(key)
        .agg((-F.sum(F.col("p") * F.log2("p"))).alias("ent"))
    )


# ---------------------------------------------------------------------
# class entropy + class balance + size-based clustering indexes
# ---------------------------------------------------------------------

_CLASSBAL_ORACLE = with_transcripts_cte(
    """
SELECT conv_id,
       round(-sum(p * log2(p)), 6)                           AS class_ent,
       round(-sum(p * ln(p)), 6)                             AS nre,
       round(CASE WHEN count(*) > 1
             THEN -sum(p * log2(p)) / log2(count(*)) END, 6) AS c1,
       round(1.0 - 1.0 / (((count(*) - 1.0) / count(*))
             * sum(c / nullif(n - c, 0))), 6)                AS c2,
       cast(sum(CASE WHEN c < 15 THEN 1 ELSE 0 END) AS bigint) AS sc
FROM (SELECT conv_id, c,
             sum(c) OVER (PARTITION BY conv_id) AS n,
             c / sum(c) OVER (PARTITION BY conv_id) AS p
      FROM (SELECT conv_id, role, count(*) AS c
            FROM transcripts GROUP BY conv_id, role))
GROUP BY conv_id
"""
)


@register(
    "mf_class_balance",
    oracle=_CLASSBAL_ORACLE,
    group=GROUP,
    gate_oracle=False,  # r5 rotation out: recorded 4/4 rounds; pytest enforces
)
def mf_class_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """class_ent (info_theory.py:344-389), nre (clustering.py:878-912,
    natural log), c1/c2 (complexity.py:1966-2045), sc — #classes with
    <15 instances (clustering.py:915-962), all from one role-count
    aggregate (single shuffle, reused four ways — the engine analogue of
    the reference's precompute cache sharing `class_freqs`,
    /root/reference/pymfe/general.py:52-85)."""
    counts = (
        transcripts(spark, sf_dir)
        .groupBy("conv_id", "role")
        .agg(F.count("*").alias("c"))
    )
    n = F.sum("c").over(_conv_w())
    enriched = counts.withColumn("n", n).withColumn("p", F.col("c") / n)
    k = F.count("*")
    ir = ((k - F.lit(1.0)) / k) * F.sum(
        F.col("c") / F.nullif(F.col("n") - F.col("c"), F.lit(0))
    )
    return enriched.groupBy("conv_id").agg(
        r(-F.sum(F.col("p") * F.log2("p"))).alias("class_ent"),
        r(-F.sum(F.col("p") * F.log("p"))).alias("nre"),
        r(F.when(k > 1, -F.sum(F.col("p") * F.log2("p")) / F.log2(k.cast("double")))).alias(
            "c1"
        ),
        r(F.lit(1.0) - F.lit(1.0) / ir).alias("c2"),
        F.sum(F.when(F.col("c") < 15, 1).otherwise(0)).cast("long").alias("sc"),
    )


# ---------------------------------------------------------------------
# attr entropy over equal-frequency-discretized text_len
# (discretization parity: floor(n^(1/3)) bins,
#  /root/reference/pymfe/_internal.py:1550-1624; binning via
#  percent_rank is the distributed equivalent of quantile+digitize)
# ---------------------------------------------------------------------

_ATTRENT_ORACLE = with_transcripts_cte(
    """
SELECT conv_id,
       round(-sum(p * log2(p)), 6)      AS attr_ent,
       cast(count(*) AS bigint)         AS nr_bins_used
FROM (SELECT conv_id, bin,
             count(*) / sum(count(*)) OVER (PARTITION BY conv_id) AS p
      FROM (SELECT conv_id,
                   least(cast(floor(percent_rank() OVER
                         (PARTITION BY conv_id ORDER BY text_len)
                         * greatest(cast(floor(cbrt(n) + 1e-9) AS int), 1)) AS int),
                         greatest(cast(floor(cbrt(n) + 1e-9) AS int), 1) - 1) AS bin
            FROM (SELECT conv_id, text_len,
                         count(*) OVER (PARTITION BY conv_id) AS n
                  FROM turns))
      GROUP BY conv_id, bin)
GROUP BY conv_id
""",
    extra_ctes=TURNS_SQL,
)


@register("mf_info_attr_ent", oracle=_ATTRENT_ORACLE, group=GROUP)
def mf_info_attr_ent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (base 2) of equal-frequency-binned text_len.

    Parity: attr_ent info_theory.py:277-313 over the
    floor(n^(1/3))-bin discretization _internal.py:1550-1624.
    """
    t = turns(spark, sf_dir).select("conv_id", "text_len")
    t = t.withColumn("n", F.count("*").over(_conv_w()))
    # +1e-9 nudge: cbrt of a perfect cube may land epsilon-below the
    # integer in one engine and exactly on it in another
    kbins = F.greatest(F.floor(F.cbrt("n") + F.lit(1e-9)).cast("int"), F.lit(1))
    pr = F.percent_rank().over(Window.partitionBy("conv_id").orderBy("text_len"))
    binned = t.withColumn(
        "bin",
        F.least(F.floor(pr * kbins).cast("int"), (kbins - 1).cast("int")),
    )
    counts = binned.groupBy("conv_id", "bin").agg(F.count("*").alias("c"))
    ent = _entropy_from_counts(counts)
    nbins = counts.groupBy("conv_id").agg(F.count("*").alias("nr_bins_used"))
    return ent.join(nbins, "conv_id").select(
        "conv_id", r("ent").alias("attr_ent"), "nr_bins_used"
    )


# ---------------------------------------------------------------------
# joint entropy with the reference's eps-smoothed dense crosstab +
# derived mut_inf / eq_num_attr / ns_ratio
# ---------------------------------------------------------------------

_EPS = 1e-8

_JOINT_ORACLE = with_transcripts_cte(
    f"""
SELECT e.conv_id,
       round(e.joint_ent, 6)                                AS joint_ent,
       round(hr.ent + ht.ent - e.joint_ent, 6)              AS mut_inf,
       round(hr.ent / nullif(hr.ent + ht.ent - e.joint_ent, 0), 6)
                                                            AS eq_num_attr,
       round((ht.ent - (hr.ent + ht.ent - e.joint_ent))
             / nullif(hr.ent + ht.ent - e.joint_ent, 0), 6) AS ns_ratio
FROM e JOIN hr ON e.conv_id = hr.conv_id
       JOIN ht ON e.conv_id = ht.conv_id
""",
    extra_ctes=f"""
 t2 AS (SELECT conv_id, role, coalesce(tool, 'NONE') AS tool0 FROM transcripts),
 jc AS (SELECT conv_id, role, tool0, count(*) AS c FROM t2 GROUP BY conv_id, role, tool0),
 dims AS (SELECT conv_id,
                 count(DISTINCT role)  * count(DISTINCT tool0) AS cells,
                 count(*) AS n
          FROM t2 GROUP BY conv_id),
 e AS (SELECT j.conv_id,
              -(sum((j.c / d.n + {_EPS}) / (1.0 + d.cells * {_EPS})
                    * log2((j.c / d.n + {_EPS}) / (1.0 + d.cells * {_EPS})))
                + (max(d.cells) - count(*))
                  * ({_EPS} / (1.0 + max(d.cells) * {_EPS}))
                  * log2({_EPS} / (1.0 + max(d.cells) * {_EPS}))) AS joint_ent
       FROM jc j JOIN dims d ON j.conv_id = d.conv_id
       GROUP BY j.conv_id),
 hr AS (SELECT conv_id, -sum(p * log2(p)) AS ent
        FROM (SELECT conv_id, count(*) / sum(count(*)) OVER (PARTITION BY conv_id) AS p
              FROM t2 GROUP BY conv_id, role)
        GROUP BY conv_id),
 ht AS (SELECT conv_id, -sum(p * log2(p)) AS ent
        FROM (SELECT conv_id, count(*) / sum(count(*)) OVER (PARTITION BY conv_id) AS p
              FROM t2 GROUP BY conv_id, tool0)
        GROUP BY conv_id)""",
)


@register("mf_info_joint", oracle=_JOINT_ORACLE, group=GROUP)
def mf_info_joint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """joint_ent(role, tool) with the reference's eps=1e-8 smoothing
    applied to EVERY cell of the dense crosstab (zero cells included,
    info_theory.py:183-195) — realized without materializing zero cells:
    H = -[ sum_nonzero q*log2 q + (cells - nonzero) * q0*log2 q0 ],
    q = (p+eps)/Z, Z = 1 + cells*eps. Plus mut_inf (511-588),
    eq_num_attr (392-454, d=1 attr), ns_ratio (591-650)."""
    t2 = transcripts(spark, sf_dir).select(
        "conv_id", "role", F.coalesce("tool", F.lit("NONE")).alias("tool0")
    )
    # ONE scan/shuffle of the transcript derivation: every marginal
    # (role counts, tool counts, dims) folds from the joint counts, so
    # all four downstream aggregations sit on the identical jc exchange
    # and the physical plan reuses it (ReusedExchange) instead of
    # re-running the transcript window per branch.
    jc = t2.groupBy("conv_id", "role", "tool0").agg(F.count("*").alias("c"))
    dims = jc.groupBy("conv_id").agg(
        (F.count_distinct("role") * F.count_distinct("tool0")).alias("cells"),
        F.sum("c").alias("n"),
    )
    eps = F.lit(_EPS)
    z = F.lit(1.0) + F.col("cells") * eps
    q = (F.col("c") / F.col("n") + eps) / z
    q0 = eps / (F.lit(1.0) + F.max("cells") * eps)
    e = (
        jc.join(dims, "conv_id")
        .groupBy("conv_id")
        .agg(
            (
                -(
                    F.sum(q * F.log2(q))
                    + (F.max("cells") - F.count("*")) * q0 * F.log2(q0)
                )
            ).alias("joint_ent")
        )
    )
    hr = _entropy_from_counts(
        jc.groupBy("conv_id", "role").agg(F.sum("c").alias("c"))
    ).withColumnRenamed("ent", "hr")
    ht = _entropy_from_counts(
        jc.groupBy("conv_id", "tool0").agg(F.sum("c").alias("c"))
    ).withColumnRenamed("ent", "ht")
    mi = F.col("hr") + F.col("ht") - F.col("joint_ent")
    return (
        e.join(hr, "conv_id")
        .join(ht, "conv_id")
        .select(
            "conv_id",
            r("joint_ent").alias("joint_ent"),
            r(mi).alias("mut_inf"),
            r(F.col("hr") / F.nullif(mi, F.lit(0.0))).alias("eq_num_attr"),
            r((F.col("ht") - mi) / F.nullif(mi, F.lit(0.0))).alias("ns_ratio"),
        )
    )


# ---------------------------------------------------------------------
# 1-D clustering indexes on text_len grouped by role: Calinski-Harabasz
# + Davies-Bouldin (clustering.py ch 851-875, vdb 627-648)
# ---------------------------------------------------------------------

_CLUSTIDX_ORACLE = with_transcripts_cte(
    """
SELECT ch.conv_id, round(ch.ch, 6) AS ch, round(db.vdb, 6) AS vdb
FROM ch JOIN db ON ch.conv_id = db.conv_id
""",
    extra_ctes=TURNS_SQL
    + """,
 g AS (SELECT conv_id, role, count(*) AS ni, avg(text_len) AS ci,
              avg(abs(text_len - mu_i)) AS si,
              sum(pow(text_len - mu_i, 2)) AS ssw_i
       FROM (SELECT conv_id, role, text_len,
                    avg(text_len) OVER (PARTITION BY conv_id, role) AS mu_i
             FROM turns)
       GROUP BY conv_id, role),
 tot AS (SELECT conv_id, avg(text_len) AS mu, count(*) AS n FROM turns GROUP BY conv_id),
 ch AS (SELECT g.conv_id,
               (sum(g.ni * pow(g.ci - t.mu, 2)) / nullif(count(*) - 1.0, 0))
               / nullif(sum(g.ssw_i) / nullif(max(t.n) - count(*) * 1.0, 0), 0) AS ch
        FROM g JOIN tot t ON g.conv_id = t.conv_id
        GROUP BY g.conv_id),
 db AS (SELECT conv_id, avg(worst) AS vdb
        FROM (SELECT a.conv_id, a.role,
                     max((a.si + b.si) / nullif(abs(a.ci - b.ci), 0)) AS worst
              FROM g a JOIN g b
                ON a.conv_id = b.conv_id AND a.role <> b.role
              GROUP BY a.conv_id, a.role)
        GROUP BY conv_id)""",
)


@register("mf_clustering_idx", oracle=_CLUSTIDX_ORACLE, group=GROUP)
def mf_clustering_idx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calinski-Harabasz + Davies-Bouldin over (text_len | role), 1-D.

    ch = (SSB/(k-1))/(SSW/(n-k)) — clustering.py:851-875 semantics.
    vdb = mean_i max_{j != i} (s_i+s_j)/d(c_i,c_j) — clustering.py:627-648;
    the k x k centroid pairing is a per-conv self-join of <=4 rows (roles),
    shuffled once on conv_id — never a global cross join.
    """
    t = turns(spark, sf_dir)
    mu_i = F.avg("text_len").over(Window.partitionBy("conv_id", "role"))
    g = (
        t.withColumn("mu_i", mu_i)
        .groupBy("conv_id", "role")
        .agg(
            F.count("*").alias("ni"),
            F.avg("text_len").alias("ci"),
            F.avg(F.abs(F.col("text_len") - F.col("mu_i"))).alias("si"),
            F.sum(F.pow(F.col("text_len") - F.col("mu_i"), 2)).alias("ssw_i"),
        )
    )
    tot = t.groupBy("conv_id").agg(
        F.avg("text_len").alias("mu"), F.count("*").alias("n")
    )
    k = F.count("*")
    ch = (
        g.join(tot, "conv_id")
        .groupBy("conv_id")
        .agg(
            (
                (F.sum(F.col("ni") * F.pow(F.col("ci") - F.col("mu"), 2)))
                / F.nullif(k - F.lit(1.0), F.lit(0.0))
                / F.nullif(
                    F.sum("ssw_i")
                    / F.nullif(F.max("n") - k * F.lit(1.0), F.lit(0.0)),
                    F.lit(0.0),
                )
            ).alias("ch")
        )
    )
    a, b = g.alias("a"), g.alias("b")
    pair = a.join(
        b,
        (F.col("a.conv_id") == F.col("b.conv_id"))
        & (F.col("a.role") != F.col("b.role")),
    )
    worst = pair.groupBy(F.col("a.conv_id").alias("conv_id"), F.col("a.role")).agg(
        F.max(
            (F.col("a.si") + F.col("b.si"))
            / F.nullif(F.abs(F.col("a.ci") - F.col("b.ci")), F.lit(0.0))
        ).alias("worst")
    )
    db = worst.groupBy("conv_id").agg(F.avg("worst").alias("vdb"))
    return ch.join(db, "conv_id").select(
        "conv_id", r("ch").alias("ch"), r("vdb").alias("vdb")
    )


# ---------------------------------------------------------------------
# itemset group (long outputs)
# ---------------------------------------------------------------------

_ONEITEM_ORACLE = with_transcripts_cte(
    """
SELECT conv_id, item, round(support, 6) AS support
FROM (SELECT conv_id, role AS item,
             count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY conv_id) AS support
      FROM transcripts GROUP BY conv_id, role)
"""
)


@register(
    "mf_itemset_one",
    oracle=_ONEITEM_ORACLE, group=GROUP,
    gate_oracle=False,  # rotated out of the gate in r4 (long-green r1-r3); pytest enforces
)
def mf_itemset_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """one_itemset: per-value relative frequency of the binarized class
    column (itemset.py:151-190; binarization 84-96) — long format."""
    counts = (
        transcripts(spark, sf_dir)
        .groupBy("conv_id", F.col("role").alias("item"))
        .agg(F.count("*").alias("c"))
    )
    return counts.select(
        "conv_id",
        "item",
        r(F.col("c") / F.sum("c").over(_conv_w())).alias("support"),
    )


_TWOITEM_ORACLE = with_transcripts_cte(
    """
SELECT p.conv_id, p.item_a, p.item_b,
       round((ca.c + cb.c - 2 * coalesce(cab.c, 0)) * 1.0 / p.n, 6) AS support_xor
FROM pairs p
JOIN ca  ON p.conv_id = ca.conv_id AND p.item_a = ca.role
JOIN cb  ON p.conv_id = cb.conv_id AND p.item_b = cb.tool0
LEFT JOIN cab ON p.conv_id = cab.conv_id AND p.item_a = cab.role
             AND p.item_b = cab.tool0
""",
    extra_ctes="""
 t2 AS (SELECT conv_id, role, coalesce(tool, 'NONE') AS tool0 FROM transcripts),
 ca AS (SELECT conv_id, role, count(*) AS c FROM t2 GROUP BY conv_id, role),
 cb AS (SELECT conv_id, tool0, count(*) AS c FROM t2 GROUP BY conv_id, tool0),
 cab AS (SELECT conv_id, role, tool0, count(*) AS c FROM t2 GROUP BY conv_id, role, tool0),
 nn AS (SELECT conv_id, count(*) AS n FROM t2 GROUP BY conv_id),
 pairs AS (SELECT ca.conv_id, ca.role AS item_a, cb.tool0 AS item_b, nn.n
           FROM ca JOIN cb ON ca.conv_id = cb.conv_id
                JOIN nn ON ca.conv_id = nn.conv_id)""",
)


@register(
    "mf_itemset_two",
    oracle=_TWOITEM_ORACLE, group=GROUP,
    gate_oracle=False,  # rotated out of the gate in r4 (long-green r1-r3); pytest enforces
)
def mf_itemset_two(spark: SparkSession, sf_dir: str) -> DataFrame:
    """two_itemset: XOR support |A xor B| / n for every (role value,
    tool value) pair (itemset.py:99-148) — computed from marginal and
    joint counts, support_xor = (|A| + |B| - 2|A and B|)/n, avoiding any
    row-level pair materialization."""
    t2 = transcripts(spark, sf_dir).select(
        "conv_id", "role", F.coalesce("tool", F.lit("NONE")).alias("tool0")
    )
    ca = t2.groupBy("conv_id", "role").agg(F.count("*").alias("ca"))
    cb = t2.groupBy("conv_id", "tool0").agg(F.count("*").alias("cb"))
    cab = t2.groupBy("conv_id", "role", "tool0").agg(F.count("*").alias("cab"))
    nn = t2.groupBy("conv_id").agg(F.count("*").alias("n"))
    pairs = ca.join(cb, "conv_id").join(nn, "conv_id")
    out = pairs.join(cab, ["conv_id", "role", "tool0"], "left").select(
        "conv_id",
        F.col("role").alias("item_a"),
        F.col("tool0").alias("item_b"),
        r(
            (F.col("ca") + F.col("cb") - 2 * F.coalesce(F.col("cab"), F.lit(0)))
            / F.col("n")
        ).alias("support_xor"),
    )
    return out


# ---------------------------------------------------------------------
# summary layer: quantiles / histogram / powersum-pnorm
# ---------------------------------------------------------------------

_QUANT_ORACLE = with_transcripts_cte(
    """
SELECT conv_id,
       round(quantile_cont(text_len, 0.00), 6) AS q_0,
       round(quantile_cont(text_len, 0.25), 6) AS q_25,
       round(quantile_cont(text_len, 0.50), 6) AS q_50,
       round(quantile_cont(text_len, 0.75), 6) AS q_75,
       round(quantile_cont(text_len, 1.00), 6) AS q_100
FROM turns GROUP BY conv_id
""",
    extra_ctes=TURNS_SQL,
)


@register(
    "summary_quantiles",
    oracle=_QUANT_ORACLE, group=GROUP,
    gate_oracle=False,  # rotated out of the gate in r4 (long-green r1-r3); pytest enforces
)
def summary_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quantiles summary (0, .25, .5, .75, 1), linear interpolation —
    _summary.py:62-143; Spark `percentile` and numpy `quantile` share
    the same interpolation."""
    t = turns(spark, sf_dir)
    return t.groupBy("conv_id").agg(
        *[
            r(F.percentile("text_len", p)).alias(f"q_{int(p * 100)}")
            for p in (0.0, 0.25, 0.5, 0.75, 1.0)
        ]
    )


_HIST_BINS = 10
_HIST_CASES = ",\n       ".join(
    f"round(sum(CASE WHEN bin = {i} THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS hist_{i}"
    for i in range(_HIST_BINS)
)
_HIST_ORACLE = with_transcripts_cte(
    f"""
SELECT conv_id,
       {_HIST_CASES}
FROM (SELECT conv_id,
             CASE WHEN mx = mn THEN 0
                  ELSE least(cast(floor((text_len - mn) / (mx - mn) * {_HIST_BINS})
                             AS int), {_HIST_BINS - 1}) END AS bin
      FROM (SELECT conv_id, text_len,
                   min(text_len) OVER (PARTITION BY conv_id) AS mn,
                   max(text_len) OVER (PARTITION BY conv_id) AS mx
            FROM turns))
GROUP BY conv_id
""",
    extra_ctes=TURNS_SQL,
)


@register(
    "summary_histogram",
    oracle=_HIST_ORACLE, group=GROUP,
    gate_oracle=False,  # rotated out of the gate in r4 (long-green r1-r3); pytest enforces
)
def summary_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """histogram summary: 10 equal-width bins, normalized counts
    (_summary.py:26-59 — np.histogram semantics: right-open bins, last
    bin closed == floor-clamp)."""
    t = turns(spark, sf_dir).select("conv_id", "text_len")
    t = t.withColumn("mn", F.min("text_len").over(_conv_w())).withColumn(
        "mx", F.max("text_len").over(_conv_w())
    )
    bin_col = F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
        F.least(
            F.floor(
                (F.col("text_len") - F.col("mn"))
                / (F.col("mx") - F.col("mn"))
                * _HIST_BINS
            ).cast("int"),
            F.lit(_HIST_BINS - 1),
        )
    )
    binned = t.withColumn("bin", bin_col)
    return binned.groupBy("conv_id").agg(
        *[
            r(
                F.sum(F.when(F.col("bin") == i, 1).otherwise(0)) / F.count("*")
            ).alias(f"hist_{i}")
            for i in range(_HIST_BINS)
        ]
    )


_POWER_ORACLE = with_transcripts_cte(
    """
SELECT conv_id,
       round(sum(text_len), 6)                AS sum_x,
       round(sum(pow(text_len, 2)), 6)        AS powersum_2,
       round(sqrt(sum(pow(text_len, 2))), 6)  AS pnorm_2
FROM turns GROUP BY conv_id
""",
    extra_ctes=TURNS_SQL,
)


@register("summary_powersum", oracle=_POWER_ORACLE, group=GROUP,
          # rotated out of the gate r3 (long-green); pytest enforces
          gate_oracle=False)
def summary_powersum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sum / powersum(p=2) / pnorm(p=2) summaries (_summary.py:356-444)."""
    t = turns(spark, sf_dir)
    return t.groupBy("conv_id").agg(
        r(F.sum("text_len")).alias("sum_x"),
        r(F.sum(F.pow("text_len", 2))).alias("powersum_2"),
        r(F.sqrt(F.sum(F.pow("text_len", 2)))).alias("pnorm_2"),
    )


# ---------------------------------------------------------------------
# gravity: distance between majority / minority class centroids
# (/root/reference/pymfe/statistical.py:305-407)
# ---------------------------------------------------------------------

_GRAVITY_ORACLE = with_transcripts_cte(
    """
SELECT maj.conv_id,
       round(sqrt(pow(maj.c_len - mino.c_len, 2)
                + pow(maj.c_gap - mino.c_gap, 2)), 6) AS gravity
FROM
 (SELECT * FROM ranked WHERE rk_maj = 1) maj
JOIN
 (SELECT * FROM ranked2 WHERE rk_min = 1) mino
ON maj.conv_id = mino.conv_id
""",
    extra_ctes=TURNS_SQL
    + """,
 cent AS (SELECT conv_id, role, count(*) AS c,
                 avg(text_len) AS c_len,
                 avg(coalesce(ts_delta_s, 0.0)) AS c_gap
          FROM turns GROUP BY conv_id, role),
 ranked AS (SELECT *,
                   row_number() OVER (PARTITION BY conv_id
                                      ORDER BY c DESC, role ASC) AS rk_maj
            FROM cent),
 ranked2 AS (SELECT *,
                    row_number() OVER (PARTITION BY conv_id
                                       ORDER BY c ASC, role ASC) AS rk_min
             FROM ranked WHERE rk_maj > 1)""",
)


@register(
    "mf_gravity",
    oracle=_GRAVITY_ORACLE,
    group=GROUP,
    gate_oracle=False,  # r5 rotation out: recorded 4/4 rounds; pytest enforces
)
def mf_gravity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Euclidean distance between majority- and minority-class centroids
    in the (text_len, ts_delta_s) plane — statistical.py:305-407, with
    deterministic tie-breaking (count, then role name) instead of the
    reference's argmax order."""
    t = turns(spark, sf_dir)
    cent = t.groupBy("conv_id", "role").agg(
        F.count("*").alias("c"),
        F.avg("text_len").alias("c_len"),
        F.avg(F.coalesce("ts_delta_s", F.lit(0.0))).alias("c_gap"),
    )
    ranked = cent.withColumn(
        "rk_maj",
        F.row_number().over(
            Window.partitionBy("conv_id").orderBy(F.desc("c"), F.asc("role"))
        ),
    )
    # minority chosen among the non-majority classes (tie-safe)
    ranked2 = ranked.filter(F.col("rk_maj") > 1).withColumn(
        "rk_min",
        F.row_number().over(
            Window.partitionBy("conv_id").orderBy(F.asc("c"), F.asc("role"))
        ),
    )
    maj = ranked.filter(F.col("rk_maj") == 1).select(
        "conv_id", F.col("c_len").alias("maj_len"), F.col("c_gap").alias("maj_gap")
    )
    mino = ranked2.filter(F.col("rk_min") == 1).select(
        "conv_id", F.col("c_len").alias("min_len"), F.col("c_gap").alias("min_gap")
    )
    return maj.join(mino, "conv_id").select(
        "conv_id",
        r(
            F.sqrt(
                F.pow(F.col("maj_len") - F.col("min_len"), 2)
                + F.pow(F.col("maj_gap") - F.col("min_gap"), 2)
            )
        ).alias("gravity"),
    )
