"""Streaming sessionization must agree with the batch sessionizer:
same gap threshold -> same (conv, session) turn counts."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from pymfe_spark.operators.temporal import sessionized
from pymfe_spark.sources import transcripts
from pymfe_spark.streaming import streaming_session_stats
from tests.conftest import SF_SMOKE

STREAM_IN = "/tmp/stream_in"
CKPT = "/tmp/stream_ckpt"


def test_streaming_sessions_match_batch(spark):
    shutil.rmtree(STREAM_IN, ignore_errors=True)
    shutil.rmtree(CKPT, ignore_errors=True)
    transcripts(spark, SF_SMOKE).write.parquet(STREAM_IN)

    out = streaming_session_stats(spark, STREAM_IN, gap="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("complete")
        .option("checkpointLocation", CKPT)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    stream_pdf = (
        spark.table("sess_stream")
        .select("conv_id", "n_turns")
        .toPandas()
        .groupby("conv_id")["n_turns"]
        .apply(lambda s: sorted(s.tolist()))
    )

    batch_pdf = (
        sessionized(spark, SF_SMOKE, gap_s=1800.0)
        .groupBy("conv_id", "session_id")
        .agg(F.count("*").alias("n_turns"))
        .toPandas()
        .groupby("conv_id")["n_turns"]
        .apply(lambda s: sorted(s.tolist()))
    )
    assert stream_pdf.to_dict() == batch_pdf.to_dict(), (
        "streaming session_window disagrees with batch sessionization"
    )
