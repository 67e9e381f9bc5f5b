"""Sketch-tier profiling — the sublinear-memory answer path at 100 TB.

Exact ``count_distinct`` over a high-cardinality column shuffles every
distinct value; exact percentiles shuffle every row. At corpus scale
the standard answer is mergeable sketches: HyperLogLog++ for distinct
counts (``approx_count_distinct``, fixed-size registers merged
map-side, configurable relative standard deviation) and the
KLL/GK-style quantile summary behind ``approx_percentile``. Both are
partial-aggregable, so the exchange carries kilobytes per partition
regardless of data volume — the profile of a 100 TB corpus costs one
scan plus a constant-size merge.

Approximate answers differ legitimately across engines, so these
queries are rows-gated in the catalog; tests/test_curation_ops.py
bounds them against the exact values instead (HLL rsd and quantile
rank-error contracts).

The reference's analogue is its own accuracy/cost knobs — the ≤12
column cap for attr_conc and the 5000-row normality cap
(/root/reference/pymfe/info_theory.py:253-263,
statistical.py:970-976): bounded-error answers bought at bounded cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pymfe_spark.plans.catalog import register

GROUP = "sketch"

HLL_RSD = 0.02  # HyperLogLog++ target relative standard deviation
PCTS = (0.5, 0.9, 0.99)
PCT_ACCURACY = 10000  # approx_percentile accuracy knob (1/accuracy rank err)


@register("corpus_profile_sketch", oracle=None, group=GROUP)
def corpus_profile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus profile from mergeable sketches: HLL++ distinct
    document texts (content cardinality — the dedup-pressure signal)
    and approximate length percentiles. One scan, partial aggregation,
    constant-size shuffle rows."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pct = F.percentile_approx(
        "n_chars", F.array(*[F.lit(p) for p in PCTS]), F.lit(PCT_ACCURACY)
    )
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.approx_count_distinct("text", HLL_RSD).alias("approx_distinct_texts"),
        pct[0].alias("p50_chars"),
        pct[1].alias("p90_chars"),
        pct[2].alias("p99_chars"),
    )


def exact_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact twin of corpus_profile_sketch — the truth source the
    sketch tests bound against (full-shuffle cost; test-scale only)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pct = F.percentile("n_chars", F.array(*[F.lit(p) for p in PCTS]))
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.count_distinct("text").alias("distinct_texts"),
        pct[0].alias("p50_chars"),
        pct[1].alias("p90_chars"),
        pct[2].alias("p99_chars"),
    )
