"""Shared turn-level base-feature views (the engine's N/C split).

Mirrors the reference's X -> N (numeric) / C (categorical) view split
(/root/reference/pymfe/mfe.py:740-902) as *derived columns* instead of
materialized matrices: numeric features are ``text_len`` (chars),
``ts_delta_s`` (inter-turn gap, lag window), ``turn_idx``; categorical
features are ``role`` and ``tool``. All JVM-side expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pymfe_spark.sources import transcripts

def conv_window():
    """Per-conversation ordered window (requires an active session)."""
    return Window.partitionBy("conv_id").orderBy("turn_idx")

# Oracle-side twin of turns(): same derived columns in ANSI SQL.
TURNS_SQL = """
  turns AS (
    SELECT conv_id, turn_idx, role, tool, ts,
           cast(length(text) AS double) AS text_len,
           cast(epoch_us(ts) - lag(epoch_us(ts)) OVER
                (PARTITION BY conv_id ORDER BY turn_idx) AS double) / 1e6
             AS ts_delta_s
    FROM transcripts
  )"""


def turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcript turns + numeric base features.

    ``ts_delta_s`` uses exact integer microseconds (unix_micros) so the
    lag subtraction is FP-free; null on each conversation's first turn.
    """
    t = transcripts(spark, sf_dir)
    # parquet ts arrives as TIMESTAMP_NTZ; session tz is pinned to UTC so
    # the cast is the identity instant mapping and matches DuckDB epoch_us
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    return t.select(
        "conv_id",
        "turn_idx",
        "role",
        "tool",
        "ts",
        F.length("text").cast("double").alias("text_len"),
        ((us - F.lag(us).over(conv_window())).cast("double") / F.lit(1e6)).alias(
            "ts_delta_s"
        ),
    )
