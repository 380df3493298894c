"""Property tests for the checkout latch (SURVEY.md §5.2.3).

The Spark Catalyst fold (functions/latch.py) must agree with the pure-Python
reference model (UserAggregate.java semantics) on arbitrary event orderings,
including: checkout first / last / multiple / none; ""/"N/A"/null product
types; duplicate timestamps (globalseq tie-break); shuffled input order.
"""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from flink_clickstream_processor_msk_spark.functions.latch import (
    checkout_latch,
    latch_event,
)
from flink_clickstream_processor_msk_spark.functions.predicates import (
    is_checkout,
    is_real_product,
)
from reference_model import q1_session_aggregate

PRODUCT_TYPES = [None, "", "N/A", "electronics", "garden", "books"]
EVENT_TYPES = [None, "product_view", "add_to_cart", "order_checkout"]

session_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5_000),  # ts offset ms
        st.sampled_from(EVENT_TYPES),
        st.sampled_from(PRODUCT_TYPES),
    ),
    min_size=1,
    max_size=12,
)


def _spark_latch_for_sessions(spark, sessions: list[list[dict]]) -> list[int]:
    """Evaluate the latch for many sessions in one Spark job."""
    rows = [
        (sid, e["ts"], e["seq"], e.get("event_type"), e.get("product_type"))
        for sid, sess in enumerate(sessions)
        for e in sess
    ]
    df = spark.createDataFrame(
        rows, "sid int, ts long, seq long, event_type string, product_type string"
    )
    out = (
        df.groupBy("sid")
        .agg(
            checkout_latch(
                F.collect_list(
                    latch_event(
                        F.col("ts"), F.col("seq"), is_real_product(), is_checkout()
                    )
                )
            ).alias("latch")
        )
        .collect()
    )
    by_sid = {r["sid"]: r["latch"] for r in out}
    return [by_sid[i] for i in range(len(sessions))]


@settings(max_examples=8, deadline=None)
@given(st.lists(session_strategy, min_size=1, max_size=24), st.randoms())
def test_latch_matches_reference_model(spark, raw_sessions, rng):
    sessions = []
    for raw in raw_sessions:
        sess = [
            {"ts": ts, "seq": i, "event_type": et, "product_type": pt}
            for i, (ts, et, pt) in enumerate(raw)
        ]
        rng.shuffle(sess)  # Spark must impose (ts, seq) order itself
        sessions.append(sess)
    got = _spark_latch_for_sessions(spark, sessions)
    want = [q1_session_aggregate(s)["orderCheckoutEventCount"] for s in sessions]
    assert got == want


@pytest.mark.parametrize(
    "events, expected",
    [
        # checkout before any product event -> latch 0
        ([("order_checkout", "N/A"), ("view", "books")], 0),
        # checkout is itself a product event -> counts itself
        ([("view", "books"), ("order_checkout", "electronics")], 2),
        # multiple checkouts: last one wins
        (
            [
                ("view", "books"),
                ("order_checkout", "N/A"),
                ("view", "garden"),
                ("view", "garden"),
                ("order_checkout", "N/A"),
            ],
            3,
        ),
        # no checkout -> 0
        ([("view", "books"), ("view", "garden")], 0),
        # null/empty product types don't count
        ([("view", None), ("view", ""), ("order_checkout", "N/A")], 0),
    ],
)
def test_latch_edge_cases(spark, events, expected):
    sess = [
        {"ts": 100 * i, "seq": i, "event_type": et, "product_type": pt}
        for i, (et, pt) in enumerate(events)
    ]
    assert _spark_latch_for_sessions(spark, [sess]) == [expected]


def test_latch_tie_break_on_globalseq(spark):
    # same timestamp: globalseq decides order; checkout at seq 2 sees both views
    sess = [
        {"ts": 0, "seq": 2, "event_type": "order_checkout", "product_type": "N/A"},
        {"ts": 0, "seq": 0, "event_type": "view", "product_type": "a"},
        {"ts": 0, "seq": 1, "event_type": "view", "product_type": "b"},
    ]
    assert _spark_latch_for_sessions(spark, [sess]) == [2]
