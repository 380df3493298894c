"""applyInPandasWithState sessionizer vs the built-in session_window path.

Both implement the Q1 semantics (UserAggregate.java:17-38); replaying the
same events through each must give identical UserIdSessionEvent rows.
"""

from __future__ import annotations

import pytest

from flink_clickstream_processor_msk_spark.operators.sessionize import (
    drop_internal,
    sessionize,
)
from flink_clickstream_processor_msk_spark.schema import CLICK_EVENT
from flink_clickstream_processor_msk_spark.sources.clickevents import (
    stream_clickevents,
    with_event_time,
)
from flink_clickstream_processor_msk_spark.streaming.sinks import memory_sink
from flink_clickstream_processor_msk_spark.streaming.stateful import (
    gap_to_millis,
    sessionize_with_state,
)
from helpers import BASE_TS, make_clickevents

SENTINEL_USER = 999_999
SENTINEL = {
    "ts": BASE_TS + 10**9,
    "seq": 10**9,
    "userid": SENTINEL_USER,
    "event_type": "view",
    "product_type": "sentinel",
}

EVENTS = [
    # user 1, session A: product views, checkout mid-session, more views
    {"ts": BASE_TS, "seq": 1, "userid": 1, "event_type": "view", "product_type": "books"},
    {"ts": BASE_TS + 100, "seq": 2, "userid": 1, "event_type": "view", "product_type": "toys"},
    {"ts": BASE_TS + 200, "seq": 3, "userid": 1, "event_type": "order_checkout", "product_type": "N/A"},
    {"ts": BASE_TS + 300, "seq": 4, "userid": 1, "event_type": "view", "product_type": "garden"},
    # user 1: exactly at the gap boundary -> touching windows MERGE (Flink
    # TimeWindow.intersects is inclusive; Spark session_window matches)
    {"ts": BASE_TS + 1_300, "seq": 5, "userid": 1, "event_type": "view", "product_type": "books"},
    # user 1, session B: strictly past the gap -> new session
    {"ts": BASE_TS + 3_000, "seq": 8, "userid": 1, "event_type": "view", "product_type": "music"},
    # user 2: checkout-only session (latch counts the checkout's own dept)
    {"ts": BASE_TS + 50, "seq": 6, "userid": 2, "event_type": "order_checkout", "product_type": "electronics"},
    # user 3: no products at all -> empty deptList, zero counts
    {"ts": BASE_TS + 80, "seq": 7, "userid": 3, "event_type": "login", "product_type": ""},
    SENTINEL,
]


def _canon(rows):
    return sorted(
        (
            r["userId"],
            r["windowBeginTime"],
            r["windowEndTime"],
            r["eventCount"],
            r["orderCheckoutEventCount"],
            tuple(r["deptList"]),
            r["eventKey"],
        )
        for r in (x.asDict() for x in rows)
        if r["userId"] != SENTINEL_USER
    )


def _run_stream(spark, src, table, max_files_per_trigger=None):
    stream = stream_clickevents(
        spark, src, watermark="0 seconds", max_files_per_trigger=max_files_per_trigger
    )
    q = memory_sink(sessionize_with_state(stream), table)
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {table}").collect()


@pytest.fixture(scope="module")
def batch_expected(spark):
    batch = make_clickevents(spark, EVENTS)
    return _canon(drop_internal(sessionize(with_event_time(batch))).collect())


def test_stateful_matches_builtin_single_batch(spark, tmp_path_factory, batch_expected):
    src = str(tmp_path_factory.mktemp("stateful-src"))
    cols = [f.name for f in CLICK_EVENT.fields]
    make_clickevents(spark, EVENTS).select(*cols).write.mode("overwrite").parquet(src)
    got = _canon(_run_stream(spark, src, "stateful_sessions"))
    assert got == batch_expected
    assert len(got) == 4  # 2 sessions for user 1, one each for users 2, 3


def test_stateful_matches_builtin_multi_batch(spark, tmp_path_factory, batch_expected):
    """File-at-a-time replay in event-time order (no late data): sessions
    span micro-batches — user 1's first session stays open across three
    batches and merges an exactly-at-gap event from a later batch — and the
    watermark advance closes sessions via event-time timeout."""
    src = str(tmp_path_factory.mktemp("stateful-multi-src"))
    cols = [f.name for f in CLICK_EVENT.fields]
    by_time = sorted(EVENTS, key=lambda e: e["ts"])
    for chunk in (by_time[:3], by_time[3:6], by_time[6:8], by_time[8:]):
        make_clickevents(spark, chunk).select(*cols).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    got = _canon(_run_stream(spark, src, "stateful_sessions_mb", max_files_per_trigger=1))
    assert got == batch_expected


def test_stateful_drops_late_events(spark, tmp_path_factory):
    """Zero-slack parity: an event behind the watermark is silently dropped
    (reference: max-seen watermark + allowedLateness(0))."""
    src = str(tmp_path_factory.mktemp("stateful-late-src"))
    cols = [f.name for f in CLICK_EVENT.fields]
    first = [
        {"ts": BASE_TS, "seq": 1, "userid": 1, "event_type": "view", "product_type": "a"},
        {"ts": BASE_TS + 60_000, "seq": 2, "userid": 2, "event_type": "view", "product_type": "b"},
    ]
    late = [
        {"ts": BASE_TS + 100, "seq": 3, "userid": 1, "event_type": "view", "product_type": "LATE"},
        SENTINEL,
    ]
    for chunk in (first, late):
        make_clickevents(spark, chunk).select(*cols).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    rows = _run_stream(spark, src, "stateful_late", max_files_per_trigger=1)
    depts = {d for r in rows for d in r["deptList"]}
    assert "LATE" not in depts
    assert {r["userId"] for r in rows} >= {1, 2}


def test_session_emitted_when_watermark_stops_exactly_at_session_end(
    spark, tmp_path_factory
):
    """Regression: the stream's final watermark lands exactly on user 1's
    session end (another user's event at T+gap). Spark's event-time timeout
    fires only when the watermark advances strictly past the armed
    timestamp, so a timer at last+gap never fires — the session must still
    be emitted (the built-in path finalizes at end <= watermark)."""
    src = str(tmp_path_factory.mktemp("boundary-src"))
    cols = [f.name for f in CLICK_EVENT.fields]
    events = [
        {"ts": BASE_TS, "seq": 1, "userid": 1, "event_type": "view", "product_type": "books"},
        {"ts": BASE_TS + 1_000, "seq": 2, "userid": 2, "event_type": "view", "product_type": "toys"},
    ]
    make_clickevents(spark, events).select(*cols).write.mode("overwrite").parquet(src)
    got = _canon(_run_stream(spark, src, "boundary_sessions"))
    assert (1, BASE_TS, BASE_TS + 1_000, 1, 0, ("books",), 1) in got


def test_stateful_cascade_session_to_tumbling_matches_batch(
    spark, tmp_path_factory
):
    """Q1→Q2 in ONE streaming query over the CUSTOM stateful sessionizer:
    applyInPandasWithState sessions cascade into the 10 s tumbling global
    aggregate (re-watermarked on the session output timestamp), replayed
    file-at-a-time; the finalized buckets must equal the batch chain.

    Two sentinels, a gap apart: the first sentinel's SESSION must itself
    close (it only does when the outer watermark passes it — i.e. after the
    second sentinel) so the inner watermark advances past every real bucket
    and the cascade's windows finalize."""
    from flink_clickstream_processor_msk_spark.operators.session_stats import (
        session_stats,
    )
    from flink_clickstream_processor_msk_spark.streaming.stateful import (
        session_stats_from_state,
    )

    sentinel2 = {
        "ts": BASE_TS + 2 * 10**9,
        "seq": 10**9 + 1,
        "userid": SENTINEL_USER,
        "event_type": "view",
        "product_type": "sentinel",
    }
    events = EVENTS + [sentinel2]
    src = str(tmp_path_factory.mktemp("cascade-src"))
    cols = [f.name for f in CLICK_EVENT.fields]
    by_time = sorted(events, key=lambda e: e["ts"])
    for chunk in (by_time[:4], by_time[4:8], by_time[8:9], by_time[9:]):
        make_clickevents(spark, chunk).select(*cols).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = stream_clickevents(
        spark, src, watermark="0 seconds", max_files_per_trigger=1
    )
    # Spark's static checker rejects any applyInPandasWithState → agg chain;
    # this cascade is provably in-order (see session_stats_from_state
    # docstring), so use the documented opt-out for the query's duration
    check_conf = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    spark.conf.set(check_conf, "false")
    try:
        q = memory_sink(
            session_stats_from_state(sessionize_with_state(stream)), "cascade_q2"
        )
        q.processAllAvailable()
        q.stop()
    finally:
        spark.conf.set(check_conf, "true")

    def canon(rows):
        return sorted(
            (
                r["windowBeginTime"],
                r["windowEndTime"],
                r["userSessionCount"],
                r["userSessionCountWithOrderCheckout"],
                r["percentSessionswithBuy"],
            )
            for r in (x.asDict() for x in rows)
            if r["windowBeginTime"] < BASE_TS + 10**8  # sentinel buckets out
        )

    got = canon(spark.sql("SELECT * FROM cascade_q2").collect())
    want = canon(
        session_stats(
            sessionize(with_event_time(make_clickevents(spark, events)))
        ).collect()
    )
    assert got == want
    assert len(got) > 0


def test_gap_to_millis():
    assert gap_to_millis("1 second") == 1_000
    assert gap_to_millis("30 minutes") == 1_800_000
    assert gap_to_millis("2 hours") == 7_200_000
    with pytest.raises(ValueError):
        gap_to_millis("3 fortnights")
