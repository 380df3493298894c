"""The streaming job: Q1 → {F1, Q2, Q3} fan-out.

Reference shape (ClickstreamProcessor.java:57-272): one source, the Q1
session aggregation feeding three downstream pipelines, each with its own
sink. Spark equivalent: the sessionized streaming DataFrame is *declared
once* and referenced by three ``writeStream`` queries — each query gets its
own checkpoint and re-executes the shared plan (micro-batch sources are
replayable, so this is correct; state is per-query).

Q2/Q3 chain a second stateful operator (tumbling window) after the session
window inside one query — Spark >= 3.4 chained-stateful semantics, with the
bucket keyed on ``window_time(session)`` = session end − 1 µs, matching
Flink's window.maxTimestamp() bucketing (SURVEY.md §2.3.7).

The reference's zero-slack watermark (ClickEventTimestampWatermarkGenerator
.java:14-16) maps to ``withWatermark(ts, '0 seconds')``: out-of-order events
behind the max seen timestamp are dropped at the session operator, late
windows are finalized exactly once.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from flink_clickstream_processor_msk_spark.operators.departments import (
    department_counts,
)
from flink_clickstream_processor_msk_spark.operators.session_stats import (
    session_stats,
)
from flink_clickstream_processor_msk_spark.operators.sessionize import (
    buy_sessions,
    drop_internal,
    sessionize,
)


@dataclass
class ClickstreamStreams:
    """The three output streams of the reference job."""

    user_sessions: DataFrame  # Q1 (UserIdSessionEvent)
    buy_sessions: DataFrame  # F1 -> K3/E3 (CP:133-134, 243-251)
    session_stats: DataFrame  # Q2 -> K2/E2 (CP:141-144, 231-239)
    department_counts: DataFrame  # Q3 -> K1/E1 (CP:149-154, 208-227)


def build_streams(
    clickevents: DataFrame,
    gap: str = "1 second",
    window: str = "10 seconds",
) -> ClickstreamStreams:
    """Declare the full dataflow over a (batch or streaming) ClickEvent DF.

    ``clickevents`` must carry the event-time column ``ts`` (see
    sources.clickevents.with_event_time); in streaming mode it must also
    have a watermark or the stateful operators cannot finalize windows.
    """
    sessions = sessionize(clickevents, gap=gap)
    return ClickstreamStreams(
        user_sessions=drop_internal(sessions),
        buy_sessions=drop_internal(buy_sessions(sessions)),
        session_stats=session_stats(sessions, window=window),
        department_counts=department_counts(sessions, window=window),
    )
