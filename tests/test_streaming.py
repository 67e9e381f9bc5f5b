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


def test_stateful_incremental_features_match_batch(spark):
    """applyInPandasWithState over multiple micro-batches must equal a
    one-shot batch aggregation: the state merge is the partial-
    aggregate combine (streaming/stateful.py)."""
    import math
    import shutil

    from pymfe_spark.streaming.stateful import streaming_incremental_features

    src = "/tmp/stateful_in"
    ckpt = "/tmp/stateful_ckpt"
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    # several files -> maxFilesPerTrigger=1 forces several micro-batches
    transcripts(spark, SF_SMOKE).repartition(4).write.parquet(src)

    out = streaming_incremental_features(spark, src, max_files_per_trigger=1)
    q = (
        out.writeStream.format("memory")
        .queryName("stateful_stream")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    updates = spark.table("stateful_stream").toPandas()
    # update mode appends one row per (conv, micro-batch); the final
    # state is the row with the max n_turns per conv
    final = updates.sort_values("n_turns").groupby("conv_id").last()

    batch = (
        transcripts(spark, SF_SMOKE)
        .groupBy("conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.avg(F.length("text")).alias("mean_len"),
            F.stddev_samp(F.length("text")).alias("sd_len"),
        )
        .toPandas()
        .set_index("conv_id")
    )
    assert len(final) == len(batch)
    for conv, row in batch.iterrows():
        got = final.loc[conv]
        assert got["n_turns"] == row["n_turns"], conv
        assert math.isclose(got["mean_len"], row["mean_len"], rel_tol=1e-9)
        assert math.isclose(got["sd_len"], row["sd_len"], rel_tol=1e-6)
