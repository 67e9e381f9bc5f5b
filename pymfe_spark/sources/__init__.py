from pymfe_spark.sources.transcripts import (  # noqa: F401
    SNAPSHOTS_SQL,
    TRANSCRIPTS_SQL,
    load_tables,
    snapshots,
    synthetic_transcripts,
    transcripts,
    with_transcripts_cte,
)
