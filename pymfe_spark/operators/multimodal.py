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


def _have(mod: str) -> bool:
    import importlib.util

    return importlib.util.find_spec(mod) is not None


HAVE_PIL = _have("PIL")
HAVE_AV = _have("av")


def decode_image(payload: bytes) -> "tuple[int, int, int]":
    """Real decoder entry point, three tiers (round-3 verdict #6):
    Pillow when importable (any format, fast); else the vendored
    pure-python PNG codec (operators/png_codec.py — stdlib zlib, so
    REAL PNG bytes decode end-to-end even in this container); else
    NotImplementedError for non-PNG bytes. The registered stand-in
    queries use :func:`fake_decode` explicitly (their payloads are
    text bytes, not images, and their oracles pin the fake's byte
    contract); tests/test_multimodal_codec.py exercises this function
    on real PNG bytes in every environment via the pure tier."""
    if HAVE_PIL:
        import io

        from PIL import Image

        with Image.open(io.BytesIO(payload)) as im:
            im.load()
            return (im.width, im.height, len(im.getbands()))
    from pymfe_spark.operators.png_codec import decode_png, is_png

    if is_png(payload):
        w, h, ch, _raster = decode_png(payload)
        return (w, h, ch)
    raise NotImplementedError(
        "non-PNG codecs not installed in this environment; "
        "use fake_decode for plumbing tests"
    )


def fake_decode(payload: bytes) -> "tuple[int, int, int]":
    """Deterministic stand-in for decode: dims derived from byte length."""
    n = len(payload)
    return (n % 640 + 1, (n * 7) % 480 + 1, 3)


def _meta_batches(decoder=fake_decode):
    """mapInPandas kernel, parameterized by decoder: the registered
    stand-in query binds :func:`fake_decode` (its payloads are text
    bytes; the oracle pins the fake's byte contract), the codec test
    binds :func:`decode_image` over real PNG bytes."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(b) for b in pdf["payload"]]
            dims = [decoder(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in payloads],
                    "sha256": [
                        hashlib.sha256(p).hexdigest() for p in payloads
                    ],
                    "fake_width": [d[0] for d in dims],
                    "fake_height": [d[1] for d in dims],
                    "fake_channels": [d[2] for d in dims],
                }
            )

    return gen


def image_meta(df: DataFrame, decoder=decode_image) -> DataFrame:
    """Real-decode entry point: (doc_id, payload binary) -> metadata
    via the SAME mapInPandas kernel as the registered query, but with
    the real codec. Raises NotImplementedError per batch when no codec
    is installed."""
    return df.mapInPandas(_meta_batches(decoder), schema=META_SCHEMA)


_META_ORACLE = """
SELECT doc_id,
       cast(octet_length(text::BLOB) AS bigint)   AS n_bytes,
       sha256(text)                          AS sha256,
       cast(octet_length(text::BLOB) % 640 + 1 AS int)       AS fake_width,
       cast((octet_length(text::BLOB) * 7) % 480 + 1 AS int) AS fake_height,
       3                                     AS fake_channels
FROM documents
"""


@register(
    "multimodal_meta",
    oracle=_META_ORACLE, group=GROUP,
    gate_oracle=False,  # rotated out of the gate in r4 (long-green r1-r3); pytest enforces
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> metadata via mapInPandas (document text bytes
    stand in for image payloads). Byte counts, sha256 checksums, and
    stub-decoded dims are oracle-checked — the Arrow batch path carries
    real evidence even with the codec stubbed."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return d.mapInPandas(_meta_batches(fake_decode), schema=META_SCHEMA)


# ---------------------------------------------------------------------
# resize + frame-sample plumbing (decode stubbed, batch shapes real)
# ---------------------------------------------------------------------

RESIZE_SCHEMA = (
    "doc_id long, out_width int, out_height int, out_bytes long, "
    "payload binary"
)


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Real resize entry point: Pillow decode -> resize -> PNG encode
    when importable; else the pure-python PNG tier (decode ->
    nearest-neighbor -> re-encode, operators/png_codec.py) for PNG
    bytes; else NotImplementedError (see :func:`decode_image` for the
    tier contract)."""
    if HAVE_PIL:
        import io

        from PIL import Image

        with Image.open(io.BytesIO(payload)) as im:
            out = im.resize((width, height))
            buf = io.BytesIO()
            out.save(buf, format="PNG")
            return buf.getvalue()
    from pymfe_spark.operators.png_codec import (
        decode_png,
        encode_png,
        is_png,
        resize_nearest,
    )

    if is_png(payload):
        w, h, ch, raster = decode_png(payload)
        return encode_png(
            resize_nearest(raster, w, h, ch, width, height),
            width,
            height,
            ch,
        )
    raise NotImplementedError(
        "non-PNG codecs not installed; use fake_resize for plumbing tests"
    )


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in: output bytes = repeating prefix of the
    input truncated/padded to width*height (stands in for the resized
    raster's size contract). An empty payload pads with a constant byte
    so the width*height output-size contract holds for every input."""
    target = max(width * height, 1)
    src = payload or b"\x00"
    reps = (target // len(src)) + 1
    return (src * reps)[:target]


def _resize_batches(width: int, height: int, resizer=fake_resize):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(b) for b in pdf["payload"]]
            out = [resizer(p, width, height) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_width": width,
                    "out_height": height,
                    "out_bytes": [len(o) for o in out],
                    "payload": out,
                }
            )

    return gen


@register("multimodal_resize", oracle=None, group=GROUP)
def multimodal_resize(
    spark: SparkSession, sf_dir: str, width: int = 64, height: int = 64
) -> DataFrame:
    """Binary payload -> resized binary via mapInPandas: the 1-in/1-out
    transform shape (decode -> raster op -> re-encode at scale). Rows
    only (binary output has no SQL twin); size contract asserted in
    unit tests."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return d.mapInPandas(_resize_batches(width, height), schema=RESIZE_SCHEMA)


_RESIZE_DIGEST_ORACLE = """
SELECT doc_id,
       CAST(64 AS INTEGER) AS out_width,
       CAST(64 AS INTEGER) AS out_height,
       CAST(4096 AS BIGINT) AS out_bytes,
       md5(substring(repeat(text, CAST(4096 // greatest(length(text), 1)
                                       + 1 AS BIGINT)),
                     1, 4096)) AS payload_md5
FROM documents
"""


@register(
    "multimodal_resize_digest",
    oracle=_RESIZE_DIGEST_ORACLE,
    group=GROUP,
)
def multimodal_resize_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multimodal_resize with the binary column digested to md5 — this
    makes the WHOLE mapInPandas resize path value-checkable: the oracle
    rebuilds the deterministic fake raster (repeat-to-4096 of the
    payload) in pure SQL and hashes it, so a single flipped byte
    anywhere in the Arrow batch plumbing fails the gate. (Document
    text is ASCII, so DuckDB's character-based repeat/substring/md5
    equals the byte-level transform Spark applies.)"""
    out = multimodal_resize(spark, sf_dir)
    return out.select(
        "doc_id",
        "out_width",
        "out_height",
        "out_bytes",
        F.md5("payload").alias("payload_md5"),
    )


FRAME_SCHEMA = (
    "doc_id long, frame_idx int, frame_ms long, frame_sha string"
)

FRAME_STRIDE_MS = 1000


def sample_frames(payload: bytes) -> "list[tuple[int, int, bytes]]":
    """Real video frame sampler: PyAV when importable (one frame per
    FRAME_STRIDE_MS of presentation time, re-encoded to PNG), else
    NotImplementedError (optional-dependency contract as above)."""
    if not HAVE_AV:
        raise NotImplementedError(
            "video codecs not installed; use fake_sample_frames"
        )
    import io

    import av

    frames: list[tuple[int, int, bytes]] = []
    next_ms = 0
    with av.open(io.BytesIO(payload)) as container:
        stream = container.streams.video[0]
        for frame in container.decode(stream):
            ms = int((frame.pts or 0) * float(stream.time_base) * 1000)
            if ms < next_ms:
                continue
            img = frame.to_image()
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            frames.append((len(frames), ms, buf.getvalue()))
            # advance from the ACCEPTED frame's pts, not the previous
            # target: a presentation-time gap (frame at 2500 ms while
            # next_ms was 1000) must not make the next few frames all
            # pass the guard — one frame per stride, per contract
            next_ms = ms + FRAME_STRIDE_MS
    return frames


def fake_sample_frames(payload: bytes) -> "list[tuple[int, int, bytes]]":
    """Deterministic stand-in: n_bytes % 7 + 1 frames at a fixed
    stride, each 'frame' a byte slice of the payload."""
    n_frames = len(payload) % 7 + 1
    step = max(len(payload) // n_frames, 1)
    return [
        (i, i * FRAME_STRIDE_MS, payload[i * step : (i + 1) * step])
        for i in range(n_frames)
    ]


def _frame_batches(sampler=fake_sample_frames):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yield from _frame_batches_inner(batches, sampler)

    return gen


def _frame_batches_inner(batches, sampler):
    for pdf in batches:
        ids, idxs, mss, shas = [], [], [], []
        for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
            payload = bytes(b)
            frames = sampler(payload)
            for i, ms, fb in frames:
                ids.append(doc_id)
                idxs.append(i)
                mss.append(ms)
                shas.append(hashlib.sha256(fb).hexdigest())
        yield pd.DataFrame(
            {
                "doc_id": ids,
                "frame_idx": idxs,
                "frame_ms": mss,
                "frame_sha": shas,
            }
        )


_FRAME_ORACLE = f"""
WITH d AS (SELECT doc_id, octet_length(text::BLOB) AS n FROM documents)
SELECT doc_id,
       cast(i.i AS int)                        AS frame_idx,
       cast(i.i * {FRAME_STRIDE_MS} AS bigint) AS frame_ms
FROM d, unnest(range(0, n % 7 + 1)) AS i(i)
"""


@register("multimodal_frame_sample", oracle=_FRAME_ORACLE, group=GROUP,
          # rotated out of the gate r3 (long-green); pytest enforces
          gate_oracle=False)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> one row PER SAMPLED FRAME via mapInPandas: the
    1-in/N-out exploding batch shape every video pipeline needs. The
    frame count/timing schedule is oracle-checked (deterministic fake
    sampler); frame content hashes are rows-only."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    out = d.mapInPandas(_frame_batches(fake_sample_frames), schema=FRAME_SCHEMA)
    return out.select("doc_id", "frame_idx", "frame_ms")
