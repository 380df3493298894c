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
