"""Custom stateful sessionizer — applyInPandasWithState variant of Q1.

The built-in path (operators.sessionize) expresses the reference's session
aggregate (UserAggregate.java:17-38 + UserAggWindowFunction.java:9-23) with
``session_window`` + Catalyst expressions. This module is the faithful
*operator-level* port for pure streaming: per-user session state driven by
event-time timeouts, exactly the shape of Flink's keyed session-window state
(ClickstreamProcessor.java:127-130) — one open-session accumulator per user,
closed when the watermark passes session end (last event + gap).

Why it exists alongside the built-in path (SURVEY.md §7.2): the checkout
latch is order-dependent, and an arbitrary-stateful operator is the
idiomatic Spark escape hatch when built-in windows can't express a
semantics. Here both paths implement the same semantics, and the test suite
asserts they agree on replayed streams — the custom-operator pattern future
operators can copy.

Scale: state per key is O(1) (five scalars + the distinct-department set —
bounded by the department vocabulary, not the event count). Events reach
Python in Arrow batches; one shuffle on userid; state store handles
persistence/checkpointing. The latch's order dependence is satisfied by
sorting each micro-batch by (eventtimestamp, globalseq) — correct under the
reference's zero-slack watermark, which already demands in-order arrival
across batches (SURVEY.md §2.3.6).
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from flink_clickstream_processor_msk_spark.functions.predicates import (
    NO_DEPARTMENT,
    ORDER_CHECKOUT,
)
from flink_clickstream_processor_msk_spark.schema import USER_SESSION

#: open-session accumulator: mirrors ClickEventAggregate.java:5-11 plus the
#: window bounds the ProcessWindowFunction would attach on fire
SESSION_STATE = T.StructType(
    [
        T.StructField("start", T.LongType()),
        T.StructField("last", T.LongType()),
        T.StructField("cnt", T.IntegerType()),
        T.StructField("latch", T.IntegerType()),
        T.StructField("depts", T.ArrayType(T.StringType())),
    ]
)

_UNIT_MS = {
    "millisecond": 1,
    "second": 1_000,
    "minute": 60_000,
    "hour": 3_600_000,
    "day": 86_400_000,
}


def gap_to_millis(gap: str) -> int:
    """'1 second' / '30 minutes' → millis (subset of Spark interval syntax)."""
    m = re.fullmatch(r"\s*(\d+)\s+(\w+?)s?\s*", gap)
    if not m or m.group(2) not in _UNIT_MS:
        raise ValueError(f"unsupported gap interval: {gap!r}")
    return int(m.group(1)) * _UNIT_MS[m.group(2)]


def _session_row(
    userid: int, start: int, last: int, cnt: int, latch: int, depts: list[str], gap_ms: int
) -> dict[str, Any]:
    return {
        "userId": userid,
        "eventCount": cnt,
        "orderCheckoutEventCount": latch,
        "deptList": sorted(depts),
        "eventKey": 1,
        "windowBeginTime": start,
        "windowEndTime": last + gap_ms,
    }


def sessionize_with_state(clickevents: DataFrame, gap: str = "1 second") -> DataFrame:
    """Per-user session windows via applyInPandasWithState.

    ``clickevents`` must be a streaming DataFrame with a watermark on ``ts``
    (sources.clickevents.stream_clickevents / kafka_clickevents). Emits
    UserIdSessionEvent rows when the watermark passes session end, same
    schema and values as operators.sessionize.
    """
    gap_ms = gap_to_millis(gap)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (userid,) = key
        out: list[dict[str, Any]] = []

        if state.hasTimedOut:
            start, last, cnt, latch, depts = state.get
            state.remove()
            yield pd.DataFrame([_session_row(userid, start, last, cnt, latch, depts, gap_ms)])
            return

        wm = state.getCurrentWatermarkMs()
        ev = pd.concat(list(pdfs), ignore_index=True)
        # zero-slack lateness: drop events behind the watermark (parity with
        # the reference's max-seen watermark + allowedLateness(0))
        ev = ev[ev["eventtimestamp"] >= wm]
        ev = ev.sort_values(["eventtimestamp", "globalseq"])

        if state.exists:
            start, last, cnt, latch, depts = state.get
            depts = set(depts)
        else:
            start = None
            last = cnt = latch = 0
            depts = set()

        for ts, etype, ptype in zip(
            ev["eventtimestamp"], ev["event_type"], ev["product_type"]
        ):
            ts = int(ts)
            # touching windows merge (Flink TimeWindow.intersects is
            # inclusive; Spark session_window matches): strictly > gap splits
            if start is not None and ts - last > gap_ms:
                out.append(_session_row(userid, start, last, cnt, latch, depts, gap_ms))
                start = None
            if start is None:
                start, cnt, latch, depts = ts, 0, 0, set()
            last = ts
            # product check before checkout latch (UserAggregate.java:19-33):
            # a checkout event with a real department counts itself
            if ptype is not None and ptype not in NO_DEPARTMENT:
                cnt += 1
                depts.add(ptype)
            if etype == ORDER_CHECKOUT:
                latch = cnt

        if start is not None:
            # the built-in path finalizes a session once wm >= end
            # (= last + gap); Spark's event-time timeout only fires when
            # the watermark advances STRICTLY past the set timestamp, so
            # arm it at end − 1 ms or the session is silently lost when
            # the final watermark lands exactly on the session end
            if last + gap_ms - 1 <= wm:
                # already closeable (or within 1 ms of it — a timer could
                # not legally be set at/behind the watermark): emit now
                out.append(_session_row(userid, start, last, cnt, latch, depts, gap_ms))
                state.remove()
            else:
                state.update((start, last, cnt, latch, sorted(depts)))
                state.setTimeoutTimestamp(last + gap_ms - 1)
        elif state.exists:
            state.remove()

        if out:
            yield pd.DataFrame(out)

    return clickevents.groupBy("userid").applyInPandasWithState(
        fn,
        outputStructType=USER_SESSION,
        stateStructType=SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def session_stats_from_state(
    sessions: DataFrame,
    window: str = "10 seconds",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Q1→Q2 cascade over the CUSTOM stateful sessionizer, in one streaming
    query: re-assign event time at the session's output timestamp
    (``windowEndTime − 1 ms`` = Flink's ``window.maxTimestamp()``,
    SURVEY.md §2.3.7), re-watermark it, and run the same global tumbling
    count/ratio aggregate as operators.session_stats — byte-identical
    output schema and values (tests assert equality with the batch chain).

    Why the explicit ``withWatermark``: ``applyInPandasWithState`` output
    carries no event-time attribute (unlike the built-in `session_window`,
    whose chained form Spark ≥ 3.4 tracks through one global watermark), so
    the cascade's second stateful operator needs its own watermark on the
    derived column. Zero-delay is safe here: a session is only emitted once
    the upstream watermark passes its end, so every later emission has a
    strictly larger end than the inner watermark — no late drops by
    construction (same argument as the reference's in-order guarantee).

    Spark's STATIC multi-stateful checker cannot see that guarantee (it
    rejects any arbitrary-stateful → aggregate chain as a "possible
    correctness issue"), so running this cascade requires
    ``spark.sql.streaming.statefulOperator.checkCorrectness.enabled=false``
    for the query — the documented opt-out for exactly this
    proven-in-order pattern; the equality-with-batch test is the proof.

    Scale: the sessionizer's userid shuffle feeds a partial-aggregated
    all-to-one window count — identical shape to the built-in chained path."""
    from flink_clickstream_processor_msk_spark.operators.session_stats import (
        windowed_session_stats,
    )

    watermarked = sessions.withColumn(
        "_session_out_ts", F.timestamp_millis(F.col("windowEndTime") - 1)
    ).withWatermark("_session_out_ts", watermark_delay)
    return windowed_session_stats(
        watermarked, F.col("_session_out_ts"), window
    )
