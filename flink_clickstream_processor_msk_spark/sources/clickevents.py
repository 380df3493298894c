"""ClickEvent source layer.

The reference consumes Avro ``ClickEvent`` records from Kafka
(ClickstreamProcessor.java:114-119). This engine exposes the same record
stream behind two readers:

- :func:`read_clickevents` — batch: the driver ``events`` parquet table
  mapped onto the ClickEvent schema (shim spec: /root/repo/FIXTURES.md §2).
- :func:`stream_clickevents` / :func:`kafka_clickevents` — streaming: file
  source for tests, Kafka + ``from_avro`` for production (needs the
  spark-sql-kafka package on the classpath; gated).

The shim is a plain Catalyst projection, so predicate pushdown and column
pruning still reach the parquet scan underneath.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# events.event_type 'purchase' plays the reference's 'order_checkout'
# (FIXTURES.md §2); 'view'/'click' double as the department names.
_DEPARTMENT_EVENT_TYPES = ("view", "click")


def clickevents_from_events(events: DataFrame) -> DataFrame:
    """Map the driver `events` table onto the ClickEvent schema.

    Column mapping per FIXTURES.md §2 — identical SQL lives in the DuckDB
    oracle (see __spark_entry__._CLICKEVENTS_SQL), so every reference-parity
    query is checked end-to-end through this same shim.

    ``ts`` arrives in one of three shapes, all truncated to epoch millis to
    match DuckDB's ``epoch_ms(ts)`` exactly:

    - TIMESTAMP_NTZ (the driver parquet stores timestamp[us] without a
      zone): wall-clock treated as UTC via an NTZ-epoch diff — session-
      timezone-independent, unlike a cast to TIMESTAMP.
    - long — legacy TIMESTAMP(NANOS) parquet read with nanosAsLong.
    - TIMESTAMP (tz-aware) — plain ``unix_millis``.
    """
    from pyspark.sql.types import LongType, TimestampNTZType

    ts_type = events.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        # integer DIV, not `/`: epoch-nanos overflow double precision (2^53)
        event_millis = F.expr("ts DIV 1000000")
    elif isinstance(ts_type, TimestampNTZType):
        event_millis = F.expr(
            "timestampdiff(MILLISECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        )
    else:
        event_millis = F.unix_millis("ts")
    return events.select(
        F.lit("0.0.0.0").alias("ip"),
        event_millis.alias("eventtimestamp"),
        F.lit("desktop").alias("devicetype"),
        F.when(F.col("event_type") == "purchase", F.lit("order_checkout"))
        .otherwise(F.col("event_type"))
        .alias("event_type"),
        F.when(
            F.col("event_type").isin(*_DEPARTMENT_EVENT_TYPES), F.col("event_type")
        )
        .otherwise(F.lit("N/A"))
        .alias("product_type"),
        F.col("user_id").alias("userid"),
        F.col("event_id").alias("globalseq"),
        (F.col("event_id") - F.lit(1)).alias("prevglobalseq"),
    )


def read_clickevents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch ClickEvent stream from a test-data tier directory.

    Works on any caller-provided SparkSession (the driver harness builds a
    vanilla one). Current driver parquet stores timestamp[us] (read as
    TIMESTAMP_NTZ, no conf needed); older tiers stored TIMESTAMP(NANOS),
    which Spark only reads with the nanosAsLong legacy conf — set it here
    at runtime, best-effort, so both generations of test data load.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # conf removed upstream; only needed for legacy NANOS files
    return clickevents_from_events(spark.read.parquet(f"{sf_dir}/events.parquet"))


def with_event_time(clickevents: DataFrame, watermark: str | None = None) -> DataFrame:
    """Attach the event-time column (+ optional watermark).

    Mirrors S2 (ClickEventTimestampWatermarkGenerator.java:14-23): event
    time is ``eventtimestamp`` epoch millis; the reference's max-seen
    watermark with zero slack maps to ``withWatermark(ts, '0 seconds')``
    (slightly more permissive intra-microbatch — SURVEY.md §2.3.6).
    """
    out = clickevents.withColumn("ts", F.timestamp_millis("eventtimestamp"))
    if watermark is not None:
        out = out.withWatermark("ts", watermark)
    return out


def stream_clickevents(
    spark: SparkSession,
    path: str,
    watermark: str = "0 seconds",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming ClickEvent source from a parquet directory (test harness).

    Stands in for the Kafka source in tests: same schema, same event-time
    column, driven to completion with ``processAllAvailable()``.
    """
    from flink_clickstream_processor_msk_spark.schema import CLICK_EVENT

    reader = spark.readStream.schema(CLICK_EVENT).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return with_event_time(reader.load(path), watermark=watermark)


class UnknownSchemaVersion(LookupError):
    """A schema-version id the registry does not know (or a resolver that
    returned nothing for it). Deliberately loud: decoding MSK bytes
    against a guessed schema would desync silently mid-record."""


def cached_schema_resolver(resolver, max_entries: int = 128,
                           cache_unknown: bool = True):
    """Bounded memo around a ``schema_resolver(version_id) -> avsc_json``
    network client — the engine-side half of the reference's Glue
    Schema Registry lookup (CP:108-111, where
    ``GlueSchemaRegistryAvroDeserializationSchema`` resolves and caches
    schema versions client-side; the AWS SerDe does the same with its
    own LRU). Wrap the deployment's GetSchemaVersion client ONCE and
    pass the wrapper everywhere a resolver is accepted.

    Semantics:

    - **Hit path**: version-id → schema text, LRU-bounded at
      ``max_entries`` (version ids are UUIDs; normalize via ``str``,
      case-insensitive). Repeat lookups never touch the network.
    - **Unknown ids** (resolver raises ``LookupError``/``KeyError`` or
      returns ``None``) raise :class:`UnknownSchemaVersion`. With
      ``cache_unknown=True`` (default) the refusal is memoized too, in
      its own ``max_entries``-bounded LRU: a poison-pill version id in a
      replayed topic would otherwise hammer the registry once per
      micro-batch retry. Schema registries are append-only, so a
      negative can only go stale through LATE registration — a
      deployment expecting that passes ``cache_unknown=False`` to
      re-consult the registry on every miss.
    - **Malformed results** (text that is not a JSON document) raise
      ``ValueError`` and are NOT cached either way: a transiently
      truncated response should not poison the id.
    """
    from collections import OrderedDict

    known: OrderedDict[str, str] = OrderedDict()
    unknown: OrderedDict[str, str] = OrderedDict()

    def _key(version_id) -> str:
        return str(version_id).lower()

    def resolve(version_id) -> str:
        k = _key(version_id)
        if k in known:
            known.move_to_end(k)
            return known[k]
        if k in unknown:
            unknown.move_to_end(k)
            raise UnknownSchemaVersion(unknown[k])
        try:
            text = resolver(version_id)
        except LookupError as exc:
            msg = (
                f"schema version {version_id} unknown to the registry: {exc}"
            )
            if cache_unknown:
                unknown[k] = msg
                while len(unknown) > max_entries:
                    unknown.popitem(last=False)
            raise UnknownSchemaVersion(msg) from exc
        if text is None:
            msg = f"schema version {version_id}: resolver returned None"
            if cache_unknown:
                unknown[k] = msg
                while len(unknown) > max_entries:
                    unknown.popitem(last=False)
            raise UnknownSchemaVersion(msg)
        try:
            json.loads(text)
        except (TypeError, ValueError) as exc:
            raise ValueError(
                f"schema version {version_id}: resolver returned a "
                f"non-JSON document ({exc}); not cached"
            ) from exc
        known[k] = text
        while len(known) > max_entries:
            known.popitem(last=False)
        return text

    resolve.cache_info = lambda: {"known": len(known), "unknown": len(unknown)}
    resolve._is_cached_resolver = True
    return resolve


def kafka_clickevents(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = "ExampleTopic",
    avro_schema_json: str | None = None,
    starting_offsets: str = "earliest",
    watermark: str = "0 seconds",
    glue_sr: bool = True,
    schema_version_id=None,
    schema_resolver=None,
    kafka_options: dict[str, str] | None = None,
) -> DataFrame:
    """Kafka ClickEvent source (S1 parity, ClickstreamProcessor.java:101-119).

    Requires org.apache.spark:spark-sql-kafka-0-10 and spark-avro on the
    classpath — not bundled in this environment, so this raises a clear
    error locally and is exercised only through its (identical) plan in
    tests via stream_clickevents.

    The reference deserializes through AWS Glue Schema Registry
    (CP:108-119), whose producers ENVELOPE every record (header byte +
    compression byte + 16-byte schema-version UUID — the public SR wire
    format, sources/avro_wire.py). ``glue_sr=True`` (default — matching
    what real MSK bytes look like) strips and validates that envelope in
    Catalyst before ``from_avro``; pass ``schema_version_id`` (a
    ``uuid.UUID``) to additionally pin the reader to one schema version.
    The registry LOOKUP is a one-liner seam: pass
    ``schema_resolver(version_id) -> avsc_json`` (e.g. a thin wrapper
    over the Glue GetSchemaVersion API, or a dict for tests) together
    with ``schema_version_id`` and the reader schema is resolved through
    it instead of the literal avsc — the resolved text must parse to the
    ClickEvent contract, which from_avro enforces structurally. Wrap the
    network client in :func:`cached_schema_resolver` ONCE per process so
    repeated reader construction (and unknown-id retries) hit its
    bounded memo instead of the registry (CP:108-111 parity). Without
    a resolver the literal avsc decode is equivalent (micro-batch
    readers pin one schema version per run either way, unlike the
    reference's per-record SpecificRecord path).
    """
    if schema_resolver is not None:
        if schema_version_id is None:
            raise ValueError("schema_resolver requires schema_version_id to look up")
        avro_schema_json = schema_resolver(schema_version_id)
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    # consumer-config passthrough (the reference's kafkaConfig properties
    # — group.id CP:104, the commented SASL_SSL/SCRAM security settings
    # CP:105-106): plain names are prefixed per Spark's kafka.* convention
    for key, value in kafka_client_options(kafka_options).items():
        reader = reader.option(key, value)
    raw = reader.load()
    return with_event_time(
        avro_decoded_events(
            raw, avro_schema_json, glue_sr=glue_sr,
            schema_version_id=schema_version_id,
        ),
        watermark=watermark,
    )


def kafka_client_options(options: dict[str, str] | None) -> dict[str, str]:
    """Normalize Kafka consumer properties for Spark's source: plain
    Kafka property names (``group.id``, ``security.protocol``,
    ``sasl.mechanism`` — the reference's kafkaConfig keys, CP:101-106)
    gain the ``kafka.`` prefix Spark routes to the client; keys already
    prefixed, and Spark's OWN source options (``maxOffsetsPerTrigger``,
    ``failOnDataLoss``, …), pass through untouched."""
    if not options:
        return {}
    spark_source_opts = {
        "maxoffsetspertrigger", "minoffsetspertrigger", "failondataloss",
        "startingoffsets", "endingoffsets", "subscribe", "subscribepattern",
        "assign", "includeheaders", "minpartitions", "groupidprefix",
        "maxtriggerdelay",
    }
    out = {}
    for key, value in options.items():
        if key.startswith("kafka.") or key.lower() in spark_source_opts:
            out[key] = value
        else:
            out[f"kafka.{key}"] = value
    return out


def glue_sr_payload(value: Column, schema_version_id=None) -> Column:
    """Catalyst strip of the Glue SR envelope: validate the header version
    byte (3), the no-compression byte (0), and — when ``schema_version_id``
    is pinned — the 16-byte version UUID, then slice off the 18-byte
    header. Invalid records raise (``raise_error``), mirroring the loud
    ValueError of the Python-side ``unframe_glue_sr``: decoding foreign
    bytes against the wrong schema would desync silently mid-record.
    Compressed records (byte 1 == 5, zlib) have no Catalyst zlib; they are
    a producer config this pipeline's producers don't use, and they refuse
    here the same as any other unexpected compression byte."""
    from flink_clickstream_processor_msk_spark.sources.avro_wire import (
        GSR_COMPRESSION_NONE,
        GSR_HEADER_LEN,
        GSR_HEADER_VERSION_BYTE,
        _version_id_bytes,
    )

    ok = (
        (F.length(value) >= F.lit(GSR_HEADER_LEN))
        & (F.substring(value, 1, 1) == F.lit(bytes((GSR_HEADER_VERSION_BYTE,))))
        & (F.substring(value, 2, 1) == F.lit(bytes((GSR_COMPRESSION_NONE,))))
    )
    if schema_version_id is not None:
        ok = ok & (
            F.substring(value, 3, 16) == F.lit(_version_id_bytes(schema_version_id))
        )
    record = F.substring(value, F.lit(GSR_HEADER_LEN + 1), F.length(value))
    return F.when(ok, record).otherwise(
        F.raise_error(
            F.format_string(
                "bad Glue SR envelope (header/compression/version) in record: %s",
                F.base64(F.substring(value, 1, GSR_HEADER_LEN)),
            )
        ).cast("binary")
    )


def avro_decoded_events(
    raw: DataFrame,
    avro_schema_json: str | None = None,
    glue_sr: bool = False,
    schema_version_id=None,
) -> DataFrame:
    """``value`` binary column → ClickEvent columns: THE S1
    deserialization expression, shared by :func:`kafka_clickevents` and
    the broker-free wire-format tests (tests/test_avro_wire.py feeds it
    bytes produced by sources/avro_wire.py, which are pinned
    byte-identical to the Apache Avro reference implementation) so the
    tested plan fragment IS the production one. ``glue_sr=True`` strips
    the Schema Registry envelope first (:func:`glue_sr_payload`)."""
    from pyspark.sql.avro.functions import from_avro

    if avro_schema_json is None:
        avro_schema_json = CLICK_EVENT_AVSC
    value = F.col("value")
    if glue_sr:
        value = glue_sr_payload(value, schema_version_id)
    return raw.select(
        from_avro(value, avro_schema_json).alias("event")
    ).select("event.*")


# Literal copy of the reference's source-of-truth schema
# (src/main/resources/avro/ClickEvent.avsc:1-15).
CLICK_EVENT_AVSC = """
{
  "namespace": "samples.clickstream.avro",
  "type": "record",
  "name": "ClickEvent",
  "fields": [
    {"name": "ip", "type": "string"},
    {"name": "eventtimestamp", "type": "long"},
    {"name": "devicetype", "type": "string"},
    {"name": "event_type", "type": ["string", "null"]},
    {"name": "product_type", "type": ["string", "null"]},
    {"name": "userid", "type": "int"},
    {"name": "globalseq", "type": "long"},
    {"name": "prevglobalseq", "type": "long", "default": 0}
  ]
}
"""
