"""The checkout latch — the one genuinely custom aggregate in the engine.

Reference semantics (UserAggregate.java:17-38): per session, each event with
a real product_type increments ``eventCount``; each ``order_checkout`` event
*latches* the current ``eventCount`` into ``eventCountWithOrderCheckout``
(the product check runs first, so a checkout event that itself has a real
department counts itself). The observable result is "number of product
events at the time of the LAST checkout", 0 when the session has no
checkout.

The latch is order-dependent (SURVEY.md §2.3.2-3): events are processed in
event-time order, ties broken by ``globalseq`` (the strictly-increasing
global sequence, ClickEvent.avsc:11). The reference's ``merge()`` SUMS two
latches (UserAggregate.java:48) — inconsistent with ``add()``'s overwrite
and only reachable through Flink session-merge corner cases — so this engine
deliberately implements the clean last-checkout-latch semantics.

Spark-first implementation: no Python in the hot path. Events are gathered
with ``collect_list`` (bounded: one session's events), sorted with
``sort_array`` (lexicographic on (ts, seq)), and folded with the
``aggregate`` higher-order function — all Catalyst expressions that run
inside whole-stage codegen and work identically in batch and streaming
aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def latch_event(ts: Column, seq: Column, product: Column, checkout: Column) -> Column:
    """Per-event struct fed to :func:`checkout_latch`.

    Field order (t, seq, p, c) is load-bearing: ``sort_array`` on
    array<struct> sorts lexicographically by field position, giving the
    (event-time, globalseq) order the latch semantics require.
    """
    return F.struct(
        ts.alias("t"),
        seq.alias("seq"),
        product.cast("int").alias("p"),
        checkout.cast("int").alias("c"),
    )


def checkout_latch(events: Column) -> Column:
    """Fold an unordered array of latch_event structs into the latch value.

    ``events`` is typically ``collect_list(latch_event(...))`` inside a
    session-window aggregation. Returns int: product-event count at the last
    checkout, 0 if no checkout occurred.
    """
    return F.aggregate(
        F.sort_array(events),
        F.struct(F.lit(0).alias("cnt"), F.lit(0).alias("latch")),
        lambda acc, e: F.struct(
            (acc["cnt"] + e["p"]).alias("cnt"),
            F.when(e["c"] == 1, acc["cnt"] + e["p"]).otherwise(acc["latch"]).alias("latch"),
        ),
        lambda acc: acc["latch"],
    )
