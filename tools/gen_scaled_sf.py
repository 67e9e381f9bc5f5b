"""Deterministic scaled + skew-planted test-data generator.

Round-3 scale-stress enabler (VERDICT "Next round" #1): synthesizes a
larger copy of a driver-generated sf directory, optionally planting
the two pathological fixtures every 100 TB pipeline must survive:

- ``--mega-conv N``: ONE conversation of N turns (user_id 999998 —
  six digits, safe under the conv_id lpad) — the mega-conversation
  skew fixture for the hybrid extraction path;
- ``--neardup M``: a boilerplate cluster of M EXACT-duplicate
  documents (doc_id 900_000_000+i) — the mega near-dup cluster the
  LSH band-bucket cap must route to the exact tier — plus a 5-doc
  sub-cap near-dup group that LSH must still pair (recall check).

Everything is Spark column expressions over ``spark.range`` /
``explode(sequence(...))`` — no driver-side data, fully deterministic.

Usage:
    python tools/gen_scaled_sf.py SRC DST R [--mega-conv N] [--neardup M]
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# replicated user_ids stay unique AFTER the transcript derivation's
# lpad-6 truncation as long as user_id <= 999_997 (999_998 is the
# planted mega conversation): source user_ids are 0..1999, so the
# stride supports R <= 498
USER_STRIDE = 2_000
MAX_REPLICATE = 498

BOILER = (
    "subscribe to our newsletter for the latest updates and offers "
    "terms and conditions apply see website for details all rights "
    "reserved contact support for assistance thank you for reading "
)


def scaled_events(
    spark: SparkSession, src: str, replicate: int, mega_conv: int = 0
) -> DataFrame:
    if replicate > MAX_REPLICATE:
        raise ValueError(f"replicate > {MAX_REPLICATE} collides conv_ids")
    ev = spark.read.parquet(f"{src}/events.parquet")
    rep = F.explode(F.sequence(F.lit(0), F.lit(replicate - 1))).alias("rep")
    out = ev.select(rep, "*").select(
        (F.col("event_id") + F.col("rep") * F.lit(10_000_000)).alias(
            "event_id"
        ),
        "ts",
        (F.col("user_id") + F.col("rep") * F.lit(USER_STRIDE)).alias(
            "user_id"
        ),
        "event_type",
        "value",
        "props",
    )
    if mega_conv > 0:
        kinds = F.array(
            F.lit("click"), F.lit("view"), F.lit("purchase"), F.lit("signup")
        )
        mega = spark.range(mega_conv).select(
            (F.lit(9_000_000_000) + F.col("id")).alias("event_id"),
            (
                F.to_timestamp(F.lit("2024-01-05 00:00:00"))
                + F.make_interval(secs=F.col("id"))
            ).alias("ts"),
            F.lit(999_998).cast("long").alias("user_id"),
            F.element_at(kinds, (F.col("id") % 4 + 1).cast("int")).alias(
                "event_type"
            ),
            (
                F.pmod(F.col("id") * 1103515245 + 12345, F.lit(1000)) / 10.0
            ).alias("value"),
            F.concat(
                F.lit("p="), F.pmod(F.col("id") * 2654435761, F.lit(997))
            ).alias("props"),
        )
        out = out.unionByName(mega)
    return out


def scaled_documents(
    spark: SparkSession, src: str, replicate: int, neardup: int = 0
) -> DataFrame:
    d = spark.read.parquet(f"{src}/documents.parquet")
    rep = F.explode(F.sequence(F.lit(0), F.lit(replicate - 1))).alias("rep")
    out = d.select(rep, "*").select(
        (F.col("doc_id") + F.col("rep") * F.lit(1_000_000)).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    if neardup > 0:
        # M exact copies of the boilerplate (band buckets of size M —
        # must be routed out by the cap and owned by dedup_exact) ...
        cluster = spark.range(neardup).select(
            (F.lit(900_000_000) + F.col("id")).alias("doc_id"),
            F.lit(BOILER).alias("text"),
        )
        # ... plus a 5-doc sub-cap near-dup group LSH must still pair
        small = spark.range(5).select(
            (F.lit(910_000_000) + F.col("id")).alias("doc_id"),
            F.concat(
                F.lit(
                    "the quick brown fox jumps over the lazy dog near "
                    "the riverbank while seventeen geese watch variant "
                ),
                F.col("id"),
            ).alias("text"),
        )
        planted = cluster.unionByName(small).select(
            "doc_id",
            "text",
            F.lit("en").alias("lang"),
            F.lit("boilerplate").alias("source"),
            F.length("text").cast("long").alias("n_chars"),
        )
        out = out.unionByName(planted)
    return out


def scaled_embeddings(
    spark: SparkSession, src: str, replicate: int
) -> DataFrame:
    e = spark.read.parquet(f"{src}/embeddings.parquet")
    rep = F.explode(F.sequence(F.lit(0), F.lit(replicate - 1))).alias("rep")
    return e.select(rep, "*").select(
        (F.col("vec_id") + F.col("rep") * F.lit(1_000_000)).alias("vec_id"),
        "embedding",
        "label",
    )


def generate(
    spark: SparkSession,
    src: str,
    dst: str,
    replicate: int,
    mega_conv: int = 0,
    neardup: int = 0,
) -> None:
    os.makedirs(dst, exist_ok=True)
    scaled_events(spark, src, replicate, mega_conv).coalesce(
        max(8, replicate)
    ).write.mode("overwrite").parquet(f"{dst}/events.parquet")
    scaled_documents(spark, src, replicate, neardup).coalesce(
        max(8, replicate)
    ).write.mode("overwrite").parquet(f"{dst}/documents.parquet")
    scaled_embeddings(spark, src, replicate).coalesce(
        max(4, replicate // 4)
    ).write.mode("overwrite").parquet(f"{dst}/embeddings.parquet")


def main() -> None:
    args = sys.argv[1:]
    src, dst, r = args[0], args[1], int(args[2])
    mega = int(args[args.index("--mega-conv") + 1]) if "--mega-conv" in args else 0
    nd = int(args[args.index("--neardup") + 1]) if "--neardup" in args else 0
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pymfe_spark import get_spark

    spark = get_spark(app_name="gen_scaled_sf")
    generate(spark, src, dst, r, mega, nd)
    from pyspark.sql import functions as _F  # noqa: F401

    n_ev = spark.read.parquet(f"{dst}/events.parquet").count()
    n_doc = spark.read.parquet(f"{dst}/documents.parquet").count()
    print(f"wrote {dst}: events={n_ev} documents={n_doc}")
    spark.stop()


if __name__ == "__main__":
    main()
