"""Structured Streaming operators (SURVEY §2 Streaming EXT)."""

from ensembl_lakehouse_spark.streaming.continuous import (  # noqa: F401
    hourly_rollup_updates,
    run_continuous_rollup,
)
from ensembl_lakehouse_spark.streaming.dedup import (  # noqa: F401
    dedup_stream,
    run_dedup_to_memory,
)
from ensembl_lakehouse_spark.streaming.events import (  # noqa: F401
    hourly_stream,
    run_hourly_to_memory,
    session_stream,
    sliding_stream,
)
from ensembl_lakehouse_spark.streaming.joins import (  # noqa: F401
    attribution_join,
    attribution_join_batch,
    run_attribution_to_memory,
)
from ensembl_lakehouse_spark.streaming.stateful import (  # noqa: F401
    running_event_totals,
    run_totals_to_memory,
)
