"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All queries live in the ``pymfe_spark.plans.catalog`` registry; this
module just re-exports them in driver shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pymfe_spark.plans.catalog import load_catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the per-conversation
    meta-feature vector (general + statistical + info-theory +
    class-balance groups, one wide row per conv_id)."""
    from pymfe_spark.plans.flagship import conv_feature_vector

    return conv_feature_vector(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: e.fn for name, e in sorted(load_catalog().items())}


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL per query; omitted entries (oracle=None,
    or test-only oracles excluded from the gate's 50-query record) get
    the driver's rows-only check."""
    return {
        name: e.oracle
        for name, e in sorted(load_catalog().items())
        if e.oracle is not None and e.gate_oracle
    }
