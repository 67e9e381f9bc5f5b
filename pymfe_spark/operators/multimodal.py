"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the *decode* step is a
clearly marked stub — but the Spark-side plumbing is real and tested:
binary column handling, ``mapInPandas`` batch iteration, Arrow batch
shapes, output schema, checksum lineage. ``multimodal_meta``'s
byte-length/sha256 outputs have a full DuckDB oracle, proving the
pandas-batch path end to end.

At 100 TB the payload column would be parquet binary (or an Iceberg
file-pointer) and ``decode_image`` would call the codec per Arrow
batch — the partitioning, batch sizing (maxRecordsPerBatch) and schema
here are exactly what that job uses.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pymfe_spark.plans.catalog import register

GROUP = "multimodal"

META_SCHEMA = (
    "doc_id long, n_bytes long, sha256 string, fake_width int, "
    "fake_height int, fake_channels int"
)


def decode_image(payload: bytes) -> "tuple[int, int, int]":
    """Real decoder entry point — unavailable in this container.

    Raises NotImplementedError; callers fall back to
    :func:`fake_decode` (deterministic stand-in) so the pipeline
    remains testable without codecs.
    """
    raise NotImplementedError(
        "image codecs not installed in this environment; "
        "use fake_decode for plumbing tests"
    )


def fake_decode(payload: bytes) -> "tuple[int, int, int]":
    """Deterministic stand-in for decode: dims derived from byte length."""
    n = len(payload)
    return (n % 640 + 1, (n * 7) % 480 + 1, 3)


def _meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = [bytes(b) for b in pdf["payload"]]
        try:
            dims = [decode_image(p) for p in payloads]
        except NotImplementedError:
            dims = [fake_decode(p) for p in payloads]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": [len(p) for p in payloads],
                "sha256": [hashlib.sha256(p).hexdigest() for p in payloads],
                "fake_width": [d[0] for d in dims],
                "fake_height": [d[1] for d in dims],
                "fake_channels": [d[2] for d in dims],
            }
        )


_META_ORACLE = """
SELECT doc_id,
       cast(octet_length(text::BLOB) AS bigint)   AS n_bytes,
       sha256(text)                          AS sha256,
       cast(octet_length(text::BLOB) % 640 + 1 AS int)       AS fake_width,
       cast((octet_length(text::BLOB) * 7) % 480 + 1 AS int) AS fake_height,
       3                                     AS fake_channels
FROM documents
"""


@register("multimodal_meta", oracle=_META_ORACLE, group=GROUP)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> metadata via mapInPandas (document text bytes
    stand in for image payloads). Byte counts, sha256 checksums, and
    stub-decoded dims are oracle-checked — the Arrow batch path carries
    real evidence even with the codec stubbed."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return d.mapInPandas(_meta_batches, schema=META_SCHEMA)
