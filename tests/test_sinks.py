"""Sink-layer tests: Kafka message encoding, file sinks, foreachBatch bulk.

The Kafka broker itself isn't available here; what IS testable — and what
the reference hand-rolls (CP:208-251) — is the message encoding (JSON
value, optional JSON key) and the file/bulk delivery paths.
"""

from __future__ import annotations

import json

from flink_clickstream_processor_msk_spark.operators.sessionize import (
    drop_internal,
    sessionize,
)
from flink_clickstream_processor_msk_spark.schema import CLICK_EVENT
from flink_clickstream_processor_msk_spark.sources.clickevents import (
    stream_clickevents,
    with_event_time,
)
from flink_clickstream_processor_msk_spark.streaming.sinks import (
    bulk_foreach_batch_sink,
    file_sink,
    json_value,
    kafka_records,
)
from helpers import BASE_TS, make_clickevents

EVENTS = [
    {"ts": BASE_TS, "seq": 1, "userid": 1, "event_type": "view", "product_type": "books"},
    {"ts": BASE_TS + 200, "seq": 2, "userid": 1, "event_type": "order_checkout", "product_type": "N/A"},
    {"ts": BASE_TS + 10**9, "seq": 3, "userid": 999_999, "event_type": "view", "product_type": "sentinel"},
]


def _sessions(spark):
    return drop_internal(sessionize(with_event_time(make_clickevents(spark, EVENTS))))


def test_kafka_records_keyed(spark):
    recs = kafka_records(_sessions(spark), key_cols=["userId"]).collect()
    assert set(recs[0].asDict()) == {"key", "value"}
    for r in recs:
        key, value = json.loads(r["key"]), json.loads(r["value"])
        assert set(key) == {"userId"}
        assert key["userId"] == value["userId"]
        assert {"userId", "eventCount", "orderCheckoutEventCount", "deptList",
                "eventKey", "windowBeginTime", "windowEndTime"} <= set(value)


def test_kafka_records_keyless_round_robin(spark):
    recs = kafka_records(_sessions(spark))
    assert recs.columns == ["value"]  # no key column -> Kafka round-robins


def test_kafka_records_timestamp_column(spark):
    """timestamp_col (setWriteTimestampToKafka parity, CP:226): the named
    epoch-millis column rides along as a real timestamp column."""
    import datetime as dt

    recs = kafka_records(
        _sessions(spark), key_cols=["userId"], timestamp_col="windowEndTime"
    ).collect()
    assert set(recs[0].asDict()) == {"key", "value", "timestamp"}
    for r in recs:
        expected_ms = json.loads(r["value"])["windowEndTime"]
        got = r["timestamp"]
        assert isinstance(got, dt.datetime)
        epoch_ms = int(got.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
        assert epoch_ms == expected_ms


def test_json_value_encodes_all_columns(spark):
    row = json.loads(json_value(_sessions(spark)).first()["value"])
    assert {"userId", "eventCount", "deptList"} <= set(row)


def test_file_sink_json_roundtrip(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("sink-src"))
    out = str(tmp_path_factory.mktemp("sink-out"))
    ckpt = str(tmp_path_factory.mktemp("sink-ckpt"))
    cols = [f.name for f in CLICK_EVENT.fields]
    make_clickevents(spark, EVENTS).select(*cols).write.mode("overwrite").parquet(src)

    sessions = drop_internal(sessionize(stream_clickevents(spark, src)))
    q = file_sink(sessions, out, ckpt, fmt="json")
    q.processAllAvailable()
    q.stop()

    back = spark.read.json(out)
    got = {(r["userId"], r["eventCount"], r["orderCheckoutEventCount"])
           for r in back.collect() if r["userId"] != 999_999}
    want = {(r["userId"], r["eventCount"], r["orderCheckoutEventCount"])
            for r in _sessions(spark).collect() if r["userId"] != 999_999}
    assert got == want
    assert len(got) > 0


def test_bulk_foreach_batch_sink_delivers_batches(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("bulk-src"))
    ckpt = str(tmp_path_factory.mktemp("bulk-ckpt"))
    cols = [f.name for f in CLICK_EVENT.fields]
    make_clickevents(spark, EVENTS).select(*cols).write.mode("overwrite").parquet(src)

    seen: list[tuple[int, int]] = []  # (epoch_id, row_count)
    sessions = drop_internal(sessionize(stream_clickevents(spark, src)))
    q = bulk_foreach_batch_sink(
        sessions, lambda batch, epoch: seen.append((epoch, batch.count())), ckpt
    )
    q.processAllAvailable()
    q.stop()

    assert sum(n for _, n in seen) >= 1  # the closed session reached the bulk writer


def test_kafka_sink_frame_carries_event_time_as_header(spark):
    """The frame handed to the Kafka writeStream must not contain a
    'timestamp' column (Spark's Kafka sink would silently drop it); event
    time (setWriteTimestampToKafka parity, CP:226/239/251) rides in an
    'eventTime' header the sink DOES write."""
    from flink_clickstream_processor_msk_spark.streaming.sinks import (
        kafka_sink_frame,
    )

    frame = kafka_sink_frame(
        _sessions(spark), key_cols=["userId"], timestamp_col="windowEndTime"
    )
    assert "timestamp" not in frame.columns
    assert set(frame.columns) == {"key", "value", "headers"}
    for r in frame.collect():
        (h,) = r["headers"]
        assert h["key"] == "eventTime"
        assert int(bytes(h["value"]).decode()) == json.loads(r["value"])["windowEndTime"]


def test_kafka_sink_frame_all_three_streams_have_event_time(spark):
    """Job-level parity: the reference sets writeTimestampToKafka on ALL
    THREE producers — K1 departments (CP:226), K2 session stats (CP:239),
    K3 buy sessions (CP:251). Each stream's sink frame must carry the
    eventTime header derived from its windowEndTime."""
    from flink_clickstream_processor_msk_spark.streaming.pipeline import (
        build_streams,
    )
    from flink_clickstream_processor_msk_spark.streaming.sinks import (
        kafka_sink_frame,
    )

    streams = build_streams(with_event_time(make_clickevents(spark, EVENTS)))
    for df, key_cols in [
        (streams.department_counts, ["departmentName"]),  # K1
        (streams.session_stats, None),  # K2
        (streams.buy_sessions, None),  # K3
    ]:
        frame = kafka_sink_frame(df, key_cols, timestamp_col="windowEndTime")
        assert "headers" in frame.columns and "timestamp" not in frame.columns
        rows = frame.collect()
        assert all(r["headers"][0]["key"] == "eventTime" for r in rows)
