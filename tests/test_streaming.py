from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from dgraph_dbpedia_spark.streaming.events import (
    read_events_stream,
    run_to_memory,
    sessionize_batch,
    sessionize_stream,
    sliding_counts,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(
        "/root/testdata/sf0.001/events.parquet", os.path.join(str(d), "part-0.parquet")
    )
    return str(d)


@pytest.fixture(scope="module")
def events_batch(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet")


def test_streaming_tumbling_matches_batch(spark, events_dir, events_batch):
    """availableNow streaming tumbling counts == batch tumbling counts."""
    stream = read_events_stream(spark, events_dir)
    run_to_memory(tumbling_counts(stream), "t_tumbling", "complete")
    got = {
        (r["ws"], r["event_type"]): r["n"] for r in spark.table("t_tumbling").collect()
    }
    want = {
        (r["ws"], r["event_type"]): r["n"]
        for r in tumbling_counts(events_batch).collect()
    }
    assert got == want and len(want) > 0


def test_streaming_sliding_matches_batch(spark, events_dir, events_batch):
    stream = read_events_stream(spark, events_dir)
    run_to_memory(sliding_counts(stream), "t_sliding", "complete")
    got = spark.table("t_sliding")
    want = sliding_counts(events_batch)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    # sliding windows: roughly 2x the tumbling row count at slide=1/2 window
    assert got.count() > tumbling_counts(events_batch).count()


def test_sessionize_batch_gap_semantics(spark):
    ns = 1_000_000_000
    rows = [
        # user 1: two sessions (gap 31 min between event 2 and 3)
        (1, 1, 0 * ns),
        (2, 1, 60 * ns),
        (3, 1, (60 + 31 * 60) * ns),
        # user 2: one session
        (4, 2, 0 * ns),
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
    out = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["start_s"], r["end_s"])
        for r in sessionize_batch(df).collect()
    }
    assert out[(1, 1)] == (2, 0, 60)
    assert out[(1, 2)] == (1, 60 + 31 * 60, 60 + 31 * 60)
    assert out[(2, 1)] == (1, 0, 0)


def test_sessionize_stream_closes_sessions(spark, events_dir, events_batch):
    """Stateful streaming sessionizer emits closed sessions that agree
    with the batch twin on (user, n_events, start, end)."""
    stream = read_events_stream(spark, events_dir)
    run_to_memory(sessionize_stream(stream), "t_sessions", "append")
    got = spark.table("t_sessions")
    batch = sessionize_batch(events_batch)
    # streaming emits only *closed* sessions; every closed session must
    # exist in the batch result with identical stats
    g = {
        (r["user_id"], r["start_s"], r["end_s"]): r["n_events"]
        for r in got.collect()
    }
    b = {
        (r["user_id"], r["start_s"], r["end_s"]): r["n_events"]
        for r in batch.collect()
    }
    assert len(g) > 0
    for key, n in g.items():
        assert b.get(key) == n, key
