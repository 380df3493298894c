"""Q1 — per-user event-time session windows (+ F1 buy-session filter).

Reference: ClickstreamProcessor.java:127-130 —
``keyBy(userid) → EventTimeSessionWindows.withGap(1s) →
aggregate(UserAggregate, UserAggWindowFunction)`` producing
``UserIdSessionEvent``; plus the buy-session filter at CP:133-134.

Spark-first design:

- ``groupBy(userid, session_window(ts, gap))`` is the whole Q1a/Q1b/Q1d
  surface: Catalyst inserts the hash exchange (keyBy), the session-window
  state handles merging, and ``window.start/end`` replace the
  ProcessWindowFunction decoration (UserAggWindowFunction.java:9-23).
- The aggregate (UserAggregate.java:17-38) decomposes into built-ins —
  conditional count + collect_set — plus the order-dependent checkout latch
  (functions/latch.py), a pure Catalyst fold.
- Identical expressions run in batch (DataFrame on parquet — how the DuckDB
  oracle checks us) and streaming (state-store-backed session windows).

Scale notes: one shuffle on userid; per-session state is bounded by the
session gap (collect_list holds one session's events, not history); the
aggregation is partial/final (map-side combine) for count/collect_set and
spill-safe. Skewed users are handled by AQE skew-join/partition splitting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_clickstream_processor_msk_spark.functions.latch import (
    checkout_latch,
    latch_event,
)
from flink_clickstream_processor_msk_spark.functions.predicates import (
    is_checkout,
    is_real_product,
)

DEFAULT_GAP = "1 second"


def session_aggregates() -> list[Column]:
    """The Q1 aggregate expressions (UserAggregate.java:17-38), reusable by
    both the batch and streaming paths."""
    product = is_real_product()
    checkout = is_checkout()
    return [
        F.count(F.when(product, F.lit(1))).cast("int").alias("eventCount"),
        checkout_latch(
            F.collect_list(
                latch_event(
                    F.col("eventtimestamp"), F.col("globalseq"), product, checkout
                )
            )
        )
        .cast("int")
        .alias("orderCheckoutEventCount"),
        F.sort_array(
            F.collect_set(F.when(product, F.col("product_type")))
        ).alias("deptList"),
        F.lit(1).alias("eventKey"),  # parity: constant key, UserAggregate.java:35
    ]


def sessionize(clickevents: DataFrame, gap: str = DEFAULT_GAP) -> DataFrame:
    """ClickEvents (with event-time col ``ts``) → UserIdSessionEvent rows.

    Works on both static and streaming DataFrames; window bounds are
    emitted as epoch millis (windowEndTime = last event + gap, matching
    Flink's session maxTimestamp + 1ms boundary convention).
    """
    return (
        clickevents.groupBy(
            F.col("userid").alias("userId"),
            F.session_window(F.col("ts"), gap).alias("session"),
        )
        .agg(*session_aggregates())
        .select(
            "userId",
            "eventCount",
            "orderCheckoutEventCount",
            "deptList",
            "eventKey",
            F.unix_millis(F.col("session.start")).alias("windowBeginTime"),
            F.unix_millis(F.col("session.end")).alias("windowEndTime"),
            # kept for chained event-time windows (Q2/Q3); drop via
            # drop_internal() before emitting UserIdSessionEvent rows
            F.col("session").alias("_session"),
        )
    )


def drop_internal(df: DataFrame) -> DataFrame:
    """Strip engine-internal (underscore-prefixed) columns."""
    return df.drop(*[c for c in df.columns if c.startswith("_")])


def driver_output(df: DataFrame) -> DataFrame:
    """Driver-facing UserIdSessionEvent projection.

    The correctness harness canonicalizes rows with pandas ``sort_values``,
    which cannot sort/hash array cells — so ``deptList`` (already sorted by
    ``session_aggregates``) is emitted as a comma-joined string here. The
    array form stays internal (Q3's explode and the streaming JSON sinks,
    where an array mirrors the reference's HashSet serialization —
    pkg/UserIdSessionEvent.java:5-12).
    """
    out = drop_internal(df)
    if "deptList" in out.columns:
        out = out.withColumn("deptList", F.array_join(F.col("deptList"), ","))
    return out


def buy_sessions(user_sessions: DataFrame) -> DataFrame:
    """F1 — sessions containing a checkout (ClickstreamProcessor.java:133-134)."""
    return user_sessions.filter(F.col("orderCheckoutEventCount") != 0)
