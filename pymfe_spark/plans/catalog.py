"""Query catalog — the engine's public query surface.

Every operator from SURVEY.md §2 registers here as a named query:
``name -> (spark_fn(spark, sf_dir) -> DataFrame, oracle_sql | None)``.

The oracle SQL is ANSI SQL runnable by DuckDB over the same parquet
tables (the driver pre-registers them as views); queries over the
transcript table wrap their body in the shared ``TRANSCRIPTS_SQL`` CTE
so Spark and DuckDB compute from *identical* inputs. Queries whose
semantics are not SQL-expressible (MinHash banding, Arrow-kernel
matrix measures) register ``oracle=None`` → rows-only check.

This mirrors the reference's measure registry
(/root/reference/pymfe/_internal.py:103-140 VALID_GROUPS /
VALID_MFECLASSES + process_features at _internal.py:1035-1151): a
static, plan-time list of operator invocations — the logical plan.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryEntry:
    name: str
    fn: QueryFn
    oracle: str | None
    group: str
    # False -> the oracle is enforced by pytest/tools only, NOT shipped
    # to the driver gate: the gate records at most 50 queries and all
    # 50 slots are taken by gate oracles; a 51st would silently push a
    # recorded oracle query past the cap (the round-1 bug).
    gate_oracle: bool = True


CATALOG: dict[str, QueryEntry] = {}

# modules whose import registers queries
_OPERATOR_MODULES = (
    "pymfe_spark.operators.conv_stats",
    "pymfe_spark.operators.conv_info",
    "pymfe_spark.operators.temporal",
    "pymfe_spark.operators.asof",
    "pymfe_spark.operators.textops",
    "pymfe_spark.operators.dedup",
    "pymfe_spark.operators.dedup_cc",
    "pymfe_spark.operators.decontam",
    "pymfe_spark.operators.sampling",
    "pymfe_spark.operators.similarity",
    "pymfe_spark.operators.kmeans",
    "pymfe_spark.operators.multimodal",
    "pymfe_spark.operators.packing",
    "pymfe_spark.operators.jsonops",
    "pymfe_spark.operators.curation",
    "pymfe_spark.operators.drift",
    "pymfe_spark.operators.tabular",
    "pymfe_spark.operators.sketch",
    "pymfe_spark.operators.skew",
    "pymfe_spark.plans.extractor_queries",
    "pymfe_spark.plans.flagship",
)


def register(
    name: str,
    oracle: str | None = None,
    group: str = "misc",
    gate_oracle: bool = True,
):
    """Decorator: add a query to the catalog.

    Queries the DRIVER sees as rows-only (no oracle, or
    ``gate_oracle=False``) are registered under a ``zz_`` prefix: the
    driver's correctness gate records at most 50 queries in name order,
    so gate-oracle-backed queries (the hard signal) must sort before
    the rest — round 1 silently dropped four oracle-backed queries
    past the cap (VERDICT.md "What's wrong" #4). A ``gate_oracle=False``
    oracle is still enforced by tests/test_oracle_parity.py and
    tools/check_oracle.py.
    """

    def deco(fn: QueryFn) -> QueryFn:
        key = name if (oracle is not None and gate_oracle) else f"zz_{name}"
        CATALOG[key] = QueryEntry(
            name=key, fn=fn, oracle=oracle, group=group, gate_oracle=gate_oracle
        )
        return fn

    return deco


def load_catalog() -> dict[str, QueryEntry]:
    """Import all operator modules (idempotent) and return the catalog."""
    for mod in _OPERATOR_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError:
            pass  # module not built yet (incremental rounds)
    return CATALOG
