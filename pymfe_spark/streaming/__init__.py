from pymfe_spark.streaming.sessions import streaming_session_stats  # noqa: F401
