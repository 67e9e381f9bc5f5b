"""Real-codec multimodal path (round-2 verdict "Next round" #5).

When Pillow / PyAV are importable, the REAL decode/resize/frame-sample
entry points run through the same mapInPandas plumbing as the
registered stand-in queries; when absent (this container), the tests
SKIP — they never silently substitute the fakes, so a green run always
means what it says. The fake path stays oracle-green independently
(multimodal_meta / zz_multimodal_resize_digest in the catalog)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pymfe_spark.operators.multimodal import (
    HAVE_AV,
    HAVE_PIL,
    RESIZE_SCHEMA,
    _resize_batches,
    decode_image,
    image_meta,
    resize_image,
    sample_frames,
)


def _png_bytes(w: int, h: int, color) -> bytes:
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (w, h), color).save(buf, format="PNG")
    return buf.getvalue()


@pytest.mark.skipif(not HAVE_PIL, reason="Pillow not installed")
def test_real_decode_through_mapinpandas(spark):
    rows = [
        (1, _png_bytes(12, 8, (255, 0, 0))),
        (2, _png_bytes(3, 5, (0, 255, 0))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in image_meta(df, decode_image).collect()}
    assert (out[1].fake_width, out[1].fake_height, out[1].fake_channels) == (
        12,
        8,
        3,
    )
    assert (out[2].fake_width, out[2].fake_height) == (3, 5)
    assert out[1].n_bytes == len(rows[0][1])


@pytest.mark.skipif(not HAVE_PIL, reason="Pillow not installed")
def test_real_resize_through_mapinpandas(spark):
    df = spark.createDataFrame(
        [(7, _png_bytes(20, 30, (9, 9, 9)))], "doc_id long, payload binary"
    )
    out = df.mapInPandas(
        _resize_batches(4, 6, resize_image), schema=RESIZE_SCHEMA
    ).collect()[0]
    assert (out.out_width, out.out_height) == (4, 6)
    # the re-encoded PNG must decode to the requested raster
    assert decode_image(bytes(out.payload))[:2] == (4, 6)


@pytest.mark.skipif(not HAVE_AV, reason="PyAV not installed")
def test_real_frame_sampling():
    # a real container is needed to exercise this; encode one in-memory
    import io

    import av
    import numpy as np

    buf = io.BytesIO()
    with av.open(buf, "w", format="mp4") as container:
        stream = container.add_stream("h264", rate=4)
        stream.width, stream.height = 32, 32
        for i in range(12):
            arr = np.full((32, 32, 3), i * 20, dtype=np.uint8)
            frame = av.VideoFrame.from_ndarray(arr, format="rgb24")
            for pkt in stream.encode(frame):
                container.mux(pkt)
        for pkt in stream.encode():
            container.mux(pkt)
    frames = sample_frames(buf.getvalue())
    assert len(frames) >= 2  # 3 s of video at 1000 ms stride
    assert frames[0][0] == 0 and frames[1][1] >= 1000


def test_fake_path_still_used_by_registered_queries(spark):
    """The registered stand-in queries bind the fakes EXPLICITLY —
    installing a codec must not change their oracle-pinned outputs."""
    from pymfe_spark.operators.multimodal import multimodal_meta
    from tests.conftest import SF_SMOKE

    row = multimodal_meta(spark, SF_SMOKE).limit(1).collect()[0]
    assert row.fake_channels == 3  # the fake's constant, codec or not
