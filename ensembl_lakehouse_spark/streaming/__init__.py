"""Structured Streaming operators (SURVEY §2 Streaming EXT)."""

from ensembl_lakehouse_spark.streaming.events import (  # noqa: F401
    hourly_stream,
    run_hourly_to_memory,
    session_stream,
    sliding_stream,
)
