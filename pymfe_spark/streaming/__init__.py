from pymfe_spark.streaming.drift import (  # noqa: F401
    streaming_drift_bin_counts,
)
from pymfe_spark.streaming.neardup import (  # noqa: F401
    streaming_neardup_candidates,
)
from pymfe_spark.streaming.sessions import streaming_session_stats  # noqa: F401
from pymfe_spark.streaming.stateful import (  # noqa: F401
    streaming_incremental_features,
)
