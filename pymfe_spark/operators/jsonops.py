"""Semi-structured (JSON) column handling over the ``events`` table.

The reference's scalar-function surface has no string/JSON functions
(SURVEY.md §2.7) — but a transcript/eventlog pipeline at scale always
carries a JSON properties column, so the engine exposes the standard
extract-then-aggregate pattern: ``get_json_object`` runs JVM-side
(codegen), the cast to BIGINT prunes malformed values to NULL in both
engines, and the per-type aggregation is one map-side-combined
exchange. At 100 TB the win is that extraction happens inside the scan
projection — no UDF, no intermediate materialization of parsed maps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pymfe_spark.functions.sql_exprs import r
from pymfe_spark.plans.catalog import register

GROUP = "jsonops"

_JSON_ORACLE = """
WITH parsed AS (
  SELECT event_type,
         cast(json_extract_string(props, '$.k') AS bigint) AS k
  FROM events
)
SELECT event_type,
       cast(count(*) AS bigint)      AS n_events,
       cast(count(k) AS bigint)      AS n_parsed,
       cast(sum(k) AS bigint)        AS sum_k,
       round(avg(k), 6)              AS avg_k,
       cast(min(k) AS bigint)        AS min_k,
       cast(max(k) AS bigint)        AS max_k
FROM parsed GROUP BY event_type
"""


@register("events_json_props", oracle=_JSON_ORACLE, group=GROUP)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract the ``k`` property from the JSON ``props`` column and
    aggregate per event_type — the canonical eventlog rollup: JSON path
    extraction in the scan projection (whole-stage codegen), then one
    partial-aggregated exchange on the low-cardinality type key."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count("k").alias("n_parsed"),
            F.sum("k").alias("sum_k"),
            r(F.avg("k")).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )
