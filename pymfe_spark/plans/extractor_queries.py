"""Catalog entries for the Arrow-tier extractor.

Two kinds of evidence:
- ``mfe_extract_*``: the full extractor per group family (rows-only —
  matrix measures are not SQL-expressible).
- ``mfe_kernel_cross_check``: a pivot of extractor outputs that ARE
  SQL-expressible, with a full DuckDB oracle — proves the Arrow kernel
  path computes the same numbers as the SQL tier end-to-end (Arrow
  transfer, view assembly, summary layer included).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pymfe_spark.operators.base import TURNS_SQL, turns
from pymfe_spark.plans.catalog import register
from pymfe_spark.plans.extractor import MFESpark
from pymfe_spark.sources import with_transcripts_cte

GROUP = "metafeature-arrow"


@register("mfe_extract_core", oracle=None, group=GROUP)
def mfe_extract_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """general + statistical + info-theory groups, mean/sd summaries —
    the default extraction (long format)."""
    ex = MFESpark(groups=("general", "statistical", "info-theory"))
    return ex.extract(turns(spark, sf_dir))


@register("mfe_extract_distance", oracle=None, group=GROUP)
def mfe_extract_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """clustering + concept + itemset groups (distance-matrix tier)."""
    ex = MFESpark(groups=("clustering", "concept", "itemset"))
    return ex.extract(turns(spark, sf_dir))


@register("mfe_extract_model_based", oracle=None, group=GROUP)
def mfe_extract_model_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    """landmarking + model-based groups: 10-fold CV landmarkers and
    CART tree-shape measures, one numpy model per conversation."""
    ex = MFESpark(groups=("landmarking", "model-based"))
    return ex.extract(turns(spark, sf_dir))


@register("mfe_extract_complexity", oracle=None, group=GROUP)
def mfe_extract_complexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """complexity group: F-measures, neighborhood measures over the
    gower normalized distance matrix, dimensionality measures."""
    ex = MFESpark(groups=("complexity",))
    return ex.extract(turns(spark, sf_dir))


@register("mfe_extract_relative", oracle=None, group=GROUP)
def mfe_extract_relative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """relative-landmarking postprocess: per-conversation rank of the
    landmarkers per summary suffix (relative.py:56-156)."""
    ex = MFESpark(groups=("relative",))
    return ex.extract(turns(spark, sf_dir))


@register("mfe_extract_confidence", oracle=None, group=GROUP)
def mfe_extract_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap CIs (B=32 for the gate's runtime budget) over the
    general group — extract_with_confidence analogue."""
    ex = MFESpark(groups=("general",))
    return ex.extract_with_confidence(turns(spark, sf_dir), sample_num=32)


@register("mfe_extract_full_summaries", oracle=None, group=GROUP)
def mfe_extract_full_summaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """general group under the full summary sigma-set (histogram,
    quantiles, kurtosis, ... + nan variants) — exercises the summary
    registry end to end."""
    ex = MFESpark(
        groups=("general",),
        summaries=(
            "mean",
            "sd",
            "var",
            "count",
            "histogram",
            "iq_range",
            "kurtosis",
            "max",
            "median",
            "min",
            "quantiles",
            "range",
            "skewness",
            "sum",
            "powersum",
            "pnorm",
            "nanmean",
            "nansd",
        ),
    )
    return ex.extract(turns(spark, sf_dir))


_CROSS_ORACLE = with_transcripts_cte(
    """
SELECT conv_id,
       round(cast(count(*) AS double), 6)                 AS nr_inst,
       round(cast(count(DISTINCT role) AS double), 6)     AS nr_class,
       round(ent.class_ent, 6)                            AS class_ent,
       round((avg(text_len) + avg(coalesce(ts_delta_s, 0))
              + avg(turn_idx)) / 3.0, 6)                  AS mean_mean,
       round((stddev_samp(text_len)
              + stddev_samp(coalesce(ts_delta_s, 0))
              + stddev_samp(turn_idx)) / 3.0, 6)          AS sd_mean
FROM turns JOIN ent USING (conv_id)
GROUP BY conv_id, ent.class_ent
""",
    extra_ctes=TURNS_SQL
    + """,
 ent AS (SELECT conv_id, -sum(p * log2(p)) AS class_ent
         FROM (SELECT conv_id, count(*) / sum(count(*))
                        OVER (PARTITION BY conv_id) AS p
               FROM transcripts GROUP BY conv_id, role)
         GROUP BY conv_id)""",
)


@register("mfe_kernel_cross_check", oracle=_CROSS_ORACLE, group=GROUP)
def mfe_kernel_cross_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-kernel outputs pivoted to columns and checked against a
    pure-SQL oracle: nr_inst, nr_class, class_ent (role entropy), and
    the mean/sd summaries of the per-column statistical means/sds."""
    ex = MFESpark(groups=("general", "statistical", "info-theory"))
    long_df = ex.extract(turns(spark, sf_dir))

    def pick(name: str):
        return F.max(F.when(F.col("mtf_name") == name, F.col("mtf_val")))

    return long_df.groupBy("conv_id").agg(
        F.round(pick("nr_inst"), 6).alias("nr_inst"),
        F.round(pick("nr_class"), 6).alias("nr_class"),
        F.round(pick("class_ent"), 6).alias("class_ent"),
        F.round(pick("mean.mean"), 6).alias("mean_mean"),
        F.round(pick("sd.mean"), 6).alias("sd_mean"),
    )


@register("mfe_extract_expanding", oracle=None, group=GROUP)
def mfe_extract_expanding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-turn point-in-time extraction of the general group (stride 8
    keeps the gate's runtime bounded; stride 1 = every turn): the
    feature vector at (conv_id, turn_idx=t) reads only turns <= t.
    Rows-only; the prefix-equality leakage test is the correctness
    evidence (tests/test_plans.py)."""
    ex = MFESpark(groups=("general",))
    return ex.extract_expanding(turns(spark, sf_dir), stride=8)
