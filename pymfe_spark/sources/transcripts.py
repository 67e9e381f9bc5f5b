"""Transcript-table sources.

The engine's primary input is an Iceberg-style table of multi-turn
transcripts ``(conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp)`` (BASELINE.json:input_hint). The sandbox has
no Iceberg catalog, so two deterministic sources stand in for it:

1. :data:`TRANSCRIPTS_SQL` — a *single ANSI-SQL definition* deriving the
   transcript table from the driver-generated ``events`` parquet. The
   same text runs in Spark SQL and in DuckDB, so every downstream query
   is oracle-checkable with zero generator drift. This mirrors the
   reference's ``check_data`` ingest step
   (/root/reference/pymfe/_internal.py:1338-1399) — schema enforcement
   happens here, once, instead of per-fit type inference.

2. :func:`synthetic_transcripts` — a pure column-expression generator
   (``spark.range`` + arithmetic LCG) for unit tests: seed-stable,
   Zipf-skewed conversation lengths (exercises salting), lognormal-ish
   gaps with session breaks, no driver-side data.

At 100 TB the real source would be
``spark.read.format("iceberg").load(...)`` partitioned by a ts bucket —
everything downstream only assumes the fixed StructType.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Single source of truth for the transcript derivation. Runs verbatim in
# Spark SQL and DuckDB (both support lpad/concat/repeat/row_number and
# CAST(... AS STRING)). `floor(value)` is integral, so the double->int
# cast truncates identically in both engines.
TRANSCRIPTS_SQL = """
SELECT
  concat('c', lpad(cast(user_id AS STRING), 6, '0'))                AS conv_id,
  cast(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
       AS int)                                                       AS turn_idx,
  CASE event_type
    WHEN 'click'    THEN 'user'
    WHEN 'view'     THEN 'user'
    WHEN 'signup'   THEN 'system'
    WHEN 'purchase' THEN 'assistant'
    ELSE 'tool' END                                                  AS role,
  concat(event_type, ' ', props, ' ',
         repeat('tok ', cast(floor(value) AS int) % 17))             AS text,
  CASE event_type
    WHEN 'error'    THEN 'exec'
    WHEN 'purchase' THEN 'write'
    WHEN 'signup'   THEN 'read'
    ELSE NULL END                                                    AS tool,
  ts
FROM events
"""

# Deterministic as-of reference snapshots (FIXTURES.md §F5): every 7th
# turn of a conversation publishes a snapshot carrying a value derived
# from that turn. Runs in both engines against the transcripts CTE.
SNAPSHOTS_SQL = """
SELECT conv_id,
       ts                                   AS snap_ts,
       cast(length(text) AS double)         AS ref_value
FROM transcripts
WHERE turn_idx % 7 = 0
"""


def load_tables(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata parquet as a temp view (idempotent)."""
    for name in TABLES:
        spark.read.parquet(f"{sf_dir}/{name}.parquet").createOrReplaceTempView(name)


def transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The transcript table derived from ``events`` at ``sf_dir``."""
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView("events")
    return spark.sql(TRANSCRIPTS_SQL)


def snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The as-of reference snapshot table (FIXTURES.md §F5)."""
    transcripts(spark, sf_dir).createOrReplaceTempView("transcripts")
    return spark.sql(SNAPSHOTS_SQL)


def with_transcripts_cte(body_sql: str, extra_ctes: str = "") -> str:
    """Wrap oracle SQL in the shared transcripts CTE.

    ``extra_ctes`` may add further CTEs (e.g. snapshots) that reference
    ``transcripts``.
    """
    ctes = f"WITH transcripts AS ({TRANSCRIPTS_SQL})"
    if extra_ctes:
        ctes += f", {extra_ctes}"
    return f"{ctes}\n{body_sql}"


def synthetic_transcripts(
    spark: SparkSession,
    n_convs: int = 100,
    max_turns: int = 40,
    seed: int = 42,
    session_gap_s: int = 1800,
) -> DataFrame:
    """Seed-stable synthetic transcript table, fully distributed.

    Built from ``spark.range`` with arithmetic mixing (splitmix-style
    constants) — no driver-side rows, no Python RNG, identical output
    for a given (n_convs, max_turns, seed) at any parallelism. Turn
    counts are Zipf-skewed: conv 0 gets ``max_turns``, the tail ~4
    turns, so mega-conversation skew paths are exercised.
    """
    # candidate grid conv x turn, filtered to each conv's turn count
    base = spark.range(n_convs * max_turns).select(
        (F.col("id") / max_turns).cast("long").alias("c"),
        (F.col("id") % max_turns).cast("int").alias("turn_idx"),
    )
    # zipf-ish turn count: max_turns / (1 + 3*c/n_convs*...) with noise
    mix = F.pmod(
        (F.col("c") + F.lit(seed)) * F.lit(0x9E3779B9) + F.col("turn_idx"),
        F.lit(2**31),
    )
    n_turns = F.greatest(
        F.lit(4),
        (F.lit(max_turns) / (F.lit(1) + F.col("c") * F.lit(8.0) / F.lit(n_convs)))
        .cast("int"),
    )
    df = base.withColumn("n_turns", n_turns).filter(F.col("turn_idx") < F.col("n_turns"))
    h = F.pmod(mix * F.lit(0x85EBCA6B) + F.lit(seed), F.lit(2**31))
    role = (
        F.when(F.col("turn_idx") == 0, F.lit("system"))
        .when(F.pmod(F.col("turn_idx"), F.lit(2)) == 1, F.lit("user"))
        .when(F.pmod(h, F.lit(5)) == 0, F.lit("tool"))
        .otherwise(F.lit("assistant"))
    )
    tool = F.when(
        role.isin("tool", "assistant") & (F.pmod(h, F.lit(3)) == 0),
        F.element_at(
            F.array(F.lit("search"), F.lit("exec"), F.lit("read"), F.lit("write")),
            (F.pmod(h, F.lit(4)) + 1).cast("int"),
        ),
    )
    text = F.concat(
        role,
        F.lit(" says "),
        F.repeat(F.lit("word "), (F.pmod(h, F.lit(37)) + 1).cast("int")),
        F.lit("#"),
        F.col("c").cast("string"),
        F.lit("."),
        F.col("turn_idx").cast("string"),
    )
    # gaps: mostly 1..600 s, every 11th turn a session break (> gap)
    gap = F.when(
        F.pmod(F.col("turn_idx"), F.lit(11)) == 10, F.lit(session_gap_s * 3)
    ).otherwise(F.pmod(h, F.lit(600)) + 1)
    w = F.sum(gap).over(Window.partitionBy("c").orderBy("turn_idx"))
    return (
        df.withColumn("offset_s", w)
        .select(
            F.concat(F.lit("s"), F.lpad(F.col("c").cast("string"), 6, "0")).alias(
                "conv_id"
            ),
            F.col("turn_idx"),
            role.alias("role"),
            text.alias("text"),
            tool.alias("tool"),
            (
                F.to_timestamp(F.lit("2025-01-01 00:00:00"))
                + F.make_interval(secs=F.col("offset_s").cast("double"))
            ).alias("ts"),
        )
    )
