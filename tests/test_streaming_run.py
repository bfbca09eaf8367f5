"""End-to-end Structured Streaming tests for streaming/run.py (the gate
queries st1/st2 are additionally hash-checked in test_oracle_parity)."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from dataclod_spark.streaming.run import (
    run_to_memory,
    sessionize_stream,
    tumbling_stream,
)


def _ts(h, m=0, s=0):
    return datetime(2024, 1, 1, h, m, s, tzinfo=timezone.utc).replace(tzinfo=None)


@pytest.fixture(scope="module")
def crafted_stream(spark, tmp_path_factory):
    """user 1: two sessions well before the watermark; user 2: one session
    recent enough that its timeout never fires."""
    rows = [
        # user 1, session A: 3 events within the 30-min gap
        (1, _ts(0, 0)), (1, _ts(0, 10)), (1, _ts(0, 20)),
        # user 1, session B: a single event an hour later
        (1, _ts(1, 30)),
        # user 2: one session near the end of the data (inside gap+watermark)
        (2, _ts(9, 50)),
        # watermark anchor: the max event time
        (3, _ts(10, 0)),
    ]
    d = tmp_path_factory.mktemp("stream_src")
    spark.createDataFrame(rows, "user_id bigint, ts timestamp").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(d))
    return spark.readStream.schema("user_id bigint, ts timestamp").parquet(str(d))


def test_stateful_sessionization_semantics(spark, crafted_stream):
    out = run_to_memory(sessionize_stream(crafted_stream), spark)
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in out.collect()
    }
    base = int(_ts(0, 0).replace(tzinfo=timezone.utc).timestamp())
    # session A closed in-batch by session B's arrival; session B final via
    # timeout (ends 08:30 before watermark 09:50).  user 2's session (09:50)
    # and user 3's (10:00) are still open: timeout ts > watermark.
    assert got == {
        (1, base, base + 1200, 3),
        (1, base + 5400, base + 5400, 1),
    }


def test_tumbling_append_only_finalized_windows(spark, crafted_stream):
    ev = crafted_stream.withColumnRenamed("user_id", "event_type").selectExpr(
        "CAST(event_type AS STRING) AS event_type", "ts", "1.0 AS value"
    )
    out = run_to_memory(tumbling_stream(ev), spark)
    starts = sorted(r.window_start for r in out.collect())
    base = int(_ts(0, 0).replace(tzinfo=timezone.utc).timestamp())
    # watermark = 10:00 - 10min = 09:50 → the 09:00-10:00 window (containing
    # the 09:50 event) and the 10:00-11:00 window are not finalized
    assert starts == [base, base + 3600]
