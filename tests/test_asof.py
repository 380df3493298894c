"""Crafted-input tests for the as-of join operator (DuckDB ASOF JOIN
semantics: greatest right time ≤ left time per key, inclusive)."""

from __future__ import annotations

from flink_clickstream_processor_msk_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 5, "e1"),    # before any snapshot -> unmatched
            (1, 10, "e2"),   # ties snapshot at t=10 -> inclusive match s1
            (1, 15, "e3"),   # between snapshots -> s1
            (1, 20, "e4"),   # ties s2 -> s2
            (1, 99, "e5"),   # far after -> s2
            (2, 50, "e6"),   # other key, before its snapshot -> unmatched
            (2, 70, "e7"),   # -> s3
        ],
        "k long, t long, event string",
    )
    right = spark.createDataFrame(
        [(1, 10, "s1"), (1, 20, "s2"), (2, 60, "s3")],
        "k long, t long, snap string",
    )
    return left, right


def test_asof_inner_matches_latest_prior_or_equal(spark):
    left, right = _frames(spark)
    got = {
        r["event"]: r["snap"]
        for r in asof_join(left, right, ["k"], "t").collect()
    }
    assert got == {"e2": "s1", "e3": "s1", "e4": "s2", "e5": "s2", "e7": "s3"}


def test_asof_left_keeps_unmatched_with_nulls(spark):
    left, right = _frames(spark)
    got = {
        r["event"]: r["snap"]
        for r in asof_join(left, right, ["k"], "t", how="left").collect()
    }
    assert got["e1"] is None and got["e6"] is None
    assert len(got) == 7


def test_asof_preserves_all_left_columns(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, ["k"], "t")
    assert out.columns == ["k", "t", "event", "snap"]


def test_range_join_interval_boundaries(spark):
    """begin inclusive, end exclusive; no match outside; key-scoped."""
    from flink_clickstream_processor_msk_spark.operators.asof import range_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 19, "b"), (1, 20, "c"), (1, 9, "d"), (2, 10, "e")],
        "k long, t long, event string",
    )
    right = spark.createDataFrame(
        [(1, 10, 20, "w1"), (2, 0, 100, "w2")],
        "k long, lo long, hi long, win string",
    )
    got = {
        r["event"]: r["win"]
        for r in range_join(left, right, ["k"], "t", "lo", "hi").collect()
    }
    # a: t==lo inclusive; b: inside; c: t==hi exclusive -> dropped;
    # d: before -> dropped; e: other key's window
    assert got == {"a": "w1", "b": "w1", "e": "w2"}


def test_range_attribution_covers_every_event(spark):
    """Session intervals partition the event stream: the range join must
    relabel every event exactly once."""
    import __spark_entry__ as em

    SF = "/root/testdata/sf0.001"
    out = em.queries()["range_session_attribution"](spark, SF)
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    assert out.count() == n_events
