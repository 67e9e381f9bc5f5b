from pymfe_spark.sources.transcripts import (  # noqa: F401
    SNAPSHOTS_SQL,
    TRANSCRIPTS_SQL,
    load_tables,
    snapshots,
    synthetic_transcripts,
    transcripts,
    with_transcripts_cte,
)
from pymfe_spark.sources.arff import (  # noqa: F401
    arff_schema,
    read_arff,
    read_csv,
)
