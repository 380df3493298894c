"""Q2 — global session stats per 10 s tumbling window.

Reference: ClickstreamProcessor.java:141-144 — Q1's output keyed by the
constant ``eventKey`` (all-to-one shuffle), 10 s tumbling event-time
windows, counting (sessions, buy-sessions) and an integer-truncated
percentage (UserSessionAggregates.java:16-29; UserSessionWindowFunction
decoration).

Spark-first design: a *global* streaming aggregate needs no constant-key
hack — ``groupBy(window(...))`` with no key column is the native form.
Sessions are bucketed by Flink's window-output timestamp convention
(``window.maxTimestamp()`` = session end − 1 ms); Spark's ``window_time``
(end − 1 µs) lands every session in the same 10 s bucket, so batch and
streaming agree (SURVEY.md §2.3.7).

Quirk replicated deliberately (SURVEY.md §2.3.1): the reference computes
``buy*100/total`` in Java integer math — truncation — then stores it in a
double; we use ``floor()`` for oracle parity.

Scale notes: partial aggregation makes the all-to-one funnel cheap (each
task pre-aggregates its partition to one row per window before the
exchange); state is one small row per live 10 s window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WINDOW = "10 seconds"


def session_stats(user_sessions: DataFrame, window: str = DEFAULT_WINDOW) -> DataFrame:
    """UserIdSessionEvent rows (with `_session` window col) → UserIdAggEvent.

    Buckets each session at window_time(_session) = session end − 1 µs; this
    is also the streaming-correct chained-stateful form (Spark ≥ 3.4).
    """
    buy = F.col("orderCheckoutEventCount") != 0
    return (
        user_sessions.groupBy(
            F.window(F.window_time("_session"), window).alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("int").alias("userSessionCount"),
            F.count(F.when(buy, F.lit(1)))
            .cast("int")
            .alias("userSessionCountWithOrderCheckout"),
        )
        .select(
            "userSessionCount",
            "userSessionCountWithOrderCheckout",
            # integer-division truncation kept for reference parity
            F.floor(
                F.col("userSessionCountWithOrderCheckout")
                * 100
                / F.col("userSessionCount")
            )
            .cast("double")
            .alias("percentSessionswithBuy"),
            F.unix_millis(F.col("bucket.start")).alias("windowBeginTime"),
            F.unix_millis(F.col("bucket.end")).alias("windowEndTime"),
        )
    )
