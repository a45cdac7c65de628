"""Streaming/batch equivalence for streaming/events.py.

The batch twin events_hourly is oracle-checked against DuckDB; here
the availableNow streaming run must reproduce it: exact match on
n_events and sum_value, HLL-bounded match on n_users (the stream
reports approx_count_distinct — see the module docstring for why
exact distinct is the wrong call on an unbounded stream)."""

from __future__ import annotations

import shutil

import pytest

from ensembl_lakehouse_spark.operators import relational as R
from ensembl_lakehouse_spark.streaming import events as SE
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    # Streaming file sources want a directory of files.
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF_DIR}/events.parquet", d / "events.parquet")
    return str(d)


def test_stream_matches_batch(spark, events_dir):
    batch = {
        (r.hour, r.event_type): (r.n_events, r.sum_value, r.n_users)
        for r in R.events_hourly(spark, SF_DIR).collect()
    }
    stream = {
        (r.hour, r.event_type): (r.n_events, r.sum_value, r.n_users)
        for r in SE.run_hourly_to_memory(spark, events_dir, "t_stream_eq").collect()
    }
    assert set(stream) == set(batch)
    for key, (n, s, u) in batch.items():
        sn, ss, su = stream[key]
        assert sn == n, key
        assert ss == s, key  # decimal-accumulated: exact
        # approx_count_distinct: rsd default 5%
        assert abs(su - u) <= max(2, 0.15 * u), key


def test_sliding_windows_cover_each_event_four_times(spark, events_dir):
    out = (
        SE.sliding_stream(spark, events_dir)
        .writeStream.format("memory")
        .queryName("t_sliding")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    out.awaitTermination()
    rows = spark.table("t_sliding").collect()
    total_events = sum(r.n_events for r in rows)
    n_src = spark.read.parquet(events_dir).count()
    # 2h window sliding by 30min -> every event in exactly 4 windows.
    assert total_events == 4 * n_src


def test_watermark_is_applied(spark, events_dir):
    plan = SE.hourly_stream(spark, events_dir)._jdf.queryExecution().analyzed().toString()
    assert "watermark" in plan.lower()
