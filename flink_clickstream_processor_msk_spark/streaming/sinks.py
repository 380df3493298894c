"""Sinks.

Reference sinks (SURVEY.md §2.1 K1-K3, E1-E3, and the commented file sinks
at ClickstreamProcessor.java:156-205):

- K1 keyed Kafka JSON (departments -> Departments_Agg, message key = JSON of
  departmentName so Kafka hash-partitions by department, CP:208-227);
- K2/K3 keyless (round-robin) Kafka JSON (CP:231-251);
- E1-E3 Elasticsearch bulk sinks (AmazonElasticsearchSink.java:27-71) —
  modeled as a foreachBatch bulk writer extension point;
- row-JSON and Parquet file sinks (the reference's commented dev/test
  intent).

Spark-first: JSON encoding is ``to_json(struct(*))`` (Catalyst, no UDF);
Kafka partitioning falls out of the ``key`` column; exactly-once comes from
checkpointing + idempotent/transactional sinks rather than Flink's
two-phase-commit producer.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable, Iterable, Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def json_value(df: DataFrame) -> DataFrame:
    """Encode all columns as one JSON string column ``value`` (X1 parity:
    the reference Gson-encodes each POJO, CP:40-43)."""
    return df.select(F.to_json(F.struct(*df.columns)).alias("value"))


def kafka_records(
    df: DataFrame,
    key_cols: list[str] | None = None,
    timestamp_col: str | None = None,
) -> DataFrame:
    """Kafka message encoding (K1-K3): value = JSON of the whole row; key =
    JSON of ``key_cols`` (Kafka then hash-partitions by it, CP:211-215) or
    absent for round-robin (CP:231-251).

    ``timestamp_col`` mirrors the reference's
    ``setWriteTimestampToKafka(true)`` (CP:226) at the ENCODING level: the
    named epoch-millis column is emitted as a ``timestamp`` column for
    inspection and oracle checks. Spark's Kafka sink only consumes
    key/value/topic/partition/headers — it does NOT set the broker record
    timestamp from a ``timestamp`` column — so :func:`kafka_sink_frame`
    converts it into an ``eventTime`` header (which the sink DOES write)
    before the stream reaches ``writeStream``."""
    cols = [F.to_json(F.struct(*df.columns)).alias("value")]
    if key_cols:
        cols.insert(0, F.to_json(F.struct(*key_cols)).alias("key"))
    if timestamp_col is not None:
        cols.append(F.timestamp_millis(F.col(timestamp_col)).alias("timestamp"))
    return df.select(*cols)


def es_bulk_records(
    df: DataFrame,
    index: str,
    doc_type: str | None = None,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """E1-E3 wire encoding: the exact NDJSON line PAIR a ``/_bulk`` POST
    carries per record — ``action`` (``{"index":{"_index":…,"_type":…}}``)
    and ``source`` (the row's JSON, the same Catalyst ``to_json`` bytes
    the Kafka sinks pin). The reference indexes with index == type and
    auto-generated ids (ClickstreamProcessor.java:265-267,
    AmazonElasticsearchSink.java:38-44); ``id_cols`` opts into
    DETERMINISTIC ``_id``s (colon-joined values — e.g.
    ``(key, windowBeginTime)``), which is the pairing
    :func:`dedup_epochs` recommends to make redelivered epochs
    idempotent at the target. Pure Catalyst; oracle twins:
    oracles.e1/e2_*_es_bulk."""
    doc_type = doc_type or index
    meta = [F.lit(index).alias("_index"), F.lit(doc_type).alias("_type")]
    if id_cols:
        # concat_ws silently SKIPS null components (r13 review), so rows
        # differing only in a null id column would collide on the same
        # _id and the later document would silently overwrite the
        # earlier at the target — the opposite of the idempotent-id
        # guarantee. Refuse loudly per row instead; non-null bytes are
        # unchanged (the oracle-pinned encoding).
        parts = [
            F.when(
                F.col(c).isNull(),
                F.raise_error(
                    F.lit(
                        f"es_bulk_records: id column {c!r} is NULL — a "
                        "deterministic _id cannot skip components"
                    )
                ),
            ).otherwise(F.col(c).cast("string"))
            for c in id_cols
        ]
        meta.append(F.concat_ws(":", *parts).alias("_id"))
    action = F.to_json(F.struct(F.struct(*meta).alias("index")))
    return df.select(
        action.alias("action"),
        F.to_json(F.struct(*df.columns)).alias("source"),
    )


def kafka_sink_frame(
    df: DataFrame,
    key_cols: list[str] | None = None,
    timestamp_col: str | None = None,
) -> DataFrame:
    """The exact frame handed to the Kafka ``writeStream``: the
    :func:`kafka_records` encoding with the ``timestamp`` column carried as
    an ``eventTime`` header (epoch-millis ASCII bytes) instead.

    Spark's Kafka sink writes key/value/topic/partition/headers and nothing
    else — a ``timestamp`` column would be silently dropped, so event time
    (the reference's ``setWriteTimestampToKafka(true)``, CP:226 and the
    matching calls on all three producers) travels in a record header,
    which the sink does deliver to the broker."""
    rec = kafka_records(df, key_cols, timestamp_col)
    if timestamp_col is None:
        return rec
    header = F.struct(
        F.lit("eventTime").alias("key"),
        F.encode(F.unix_millis(F.col("timestamp")).cast("string"), "UTF-8").alias(
            "value"
        ),
    )
    return rec.withColumn("headers", F.array(header)).drop("timestamp")


def kafka_json_sink(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
    key_cols: list[str] | None = None,
    timestamp_col: str | None = None,
    output_mode: str = "append",
) -> StreamingQuery:
    """K1-K3 parity: JSON-valued Kafka sink, keyed (hash-partitioned) when
    ``key_cols`` is given, round-robin otherwise; event time rides in an
    ``eventTime`` header (:func:`kafka_sink_frame`).

    Requires spark-sql-kafka on the classpath (not bundled here; the
    message encoding is tested in batch via :func:`kafka_sink_frame`).
    """
    return (
        kafka_sink_frame(df, key_cols, timestamp_col)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .start()
    )


def file_sink(
    df: DataFrame,
    path: str,
    checkpoint_dir: str,
    fmt: str = "json",
    output_mode: str = "append",
) -> StreamingQuery:
    """Row-JSON / Parquet file sink (reference's commented CP:156-205)."""
    return (
        df.writeStream.format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .start()
    )


def memory_sink(df: DataFrame, name: str, output_mode: str = "append") -> StreamingQuery:
    """Test sink: results land in the in-memory table ``name``."""
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )


def bulk_foreach_batch_sink(
    df: DataFrame,
    bulk_write: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    output_mode: str = "append",
) -> StreamingQuery:
    """E1-E3 extension point: per-micro-batch bulk writer.

    The reference's Elasticsearch sink (AmazonElasticsearchSink.java:27-71,
    bulk flush 10000 actions / 1 s / 1 MB) maps to foreachBatch: Spark
    already delivers batched DataFrames; ``bulk_write(batch_df, epoch_id)``
    owns the client-side bulk/backoff policy. Elasticsearch clients are not
    bundled in this environment, so the engine ships the extension point,
    not a client.
    """
    return (
        df.writeStream.foreachBatch(bulk_write)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .start()
    )


def http_bulk_sender(
    endpoint: str, timeout_s: float = 10.0
) -> Callable[[list[str]], None]:
    """A ``send`` callable for :func:`make_bulk_writer` that POSTs chunks
    to ``{endpoint}/_bulk`` as NDJSON over plain stdlib HTTP — no client
    library, so the E1-E3 leg is runnable against any reachable
    Elasticsearch as-is. Raises on transport errors and non-2xx (and on
    a response body reporting ``"errors": true``), so
    :func:`send_with_backoff` drives the reference's bounded retry
    policy. Amazon OpenSearch with IAM auth needs SigV4-signed requests
    — use :func:`~...streaming.sigv4.sigv4_http_bulk_sender` (r14: the
    complete stdlib signer, pinned against the AWS documented vectors;
    the reference's AmazonElasticsearchSink.java:27-71 path). Chunk
    framing and error contract are identical either way."""
    url = endpoint.rstrip("/") + "/_bulk"

    def send(chunk: list[str]) -> None:
        import json as _json
        import urllib.error
        import urllib.request

        body = ("\n".join(chunk) + "\n").encode("utf-8")
        req = urllib.request.Request(
            url, data=body,
            headers={"Content-Type": "application/x-ndjson"},
            method="POST",
        )
        # urlopen raises HTTPError for every non-2xx before any status
        # check could run (ADVICE r14: an in-`with` status test is dead
        # code) — normalize it to the docstring's RuntimeError contract
        try:
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                payload = resp.read()
        except urllib.error.HTTPError as exc:
            raise RuntimeError(f"bulk POST {exc.code}") from exc
        try:
            parsed = _json.loads(payload)
        except ValueError:
            return  # non-JSON body (test doubles, proxies): transport OK is enough
        # isinstance, not .get-and-hope: a JSON array/scalar body (r13
        # review) raised AttributeError past the ValueError catch, and
        # send_with_backoff then re-POSTed an already-delivered chunk
        if isinstance(parsed, dict) and parsed.get("errors"):
            raise RuntimeError(f"bulk response reported errors: {payload[:500]!r}")

    return send


def dedup_epochs(
    bulk_write: Callable[[DataFrame, int], None], marker_dir: str
) -> Callable[[DataFrame, int], None]:
    """At-least-once foreachBatch → effectively-once delivery.

    The reference gets exactly-once from Flink's two-phase-commit Kafka
    producer; Spark's sinks replay a failed micro-batch with the SAME
    ``epoch_id``. Recording delivered epoch ids (one marker file per epoch,
    in a directory on driver-visible storage — foreachBatch callables run
    on the driver) turns redelivery into a no-op. The marker is written
    AFTER delivery, so a crash in between still redelivers once: the
    standard epoch-id pattern gives idempotent, not transactional,
    semantics — pair with an idempotent target (e.g. ES doc ids keyed on
    (key, windowBeginTime)) for end-to-end exactly-once.
    """

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        marker = os.path.join(marker_dir, f"epoch-{epoch_id}")
        if os.path.exists(marker):
            return
        bulk_write(batch_df, epoch_id)
        os.makedirs(marker_dir, exist_ok=True)
        with open(marker, "w"):
            pass

    return write


@dataclass(frozen=True)
class BulkFlushPolicy:
    """Default bulk-writer flush policy — reference parity with
    AmazonElasticsearchSink.java:22-24 (10 000 actions / 1 s interval /
    1 MB) and its bounded exponential backoff (lines 53-56)."""

    max_actions: int = 10_000
    max_interval_s: float = 1.0
    max_bytes: int = 1 << 20
    max_retries: int = 3
    backoff_base_s: float = 0.1


def bulk_chunks(
    docs: Iterable[str],
    policy: BulkFlushPolicy = BulkFlushPolicy(),
    clock: Callable[[], float] = time.monotonic,
) -> Iterator[list[str]]:
    """Split a document stream into bulk requests, flushing on whichever of
    action count / byte size / elapsed interval trips first."""
    buf: list[str] = []
    size = 0
    start = clock()
    for d in docs:
        buf.append(d)
        # UTF-8 bytes, not characters (r13 review): the 1 MB reference cap
        # is a wire-size limit, and CJK text is 3 bytes/char
        size += len(d.encode("utf-8"))
        if (
            len(buf) >= policy.max_actions
            or size >= policy.max_bytes
            or clock() - start >= policy.max_interval_s
        ):
            yield buf
            buf, size, start = [], 0, clock()
    if buf:
        yield buf


def send_with_backoff(
    send: Callable[[list[str]], None],
    chunk: list[str],
    policy: BulkFlushPolicy = BulkFlushPolicy(),
    sleep: Callable[[float], None] = time.sleep,
) -> None:
    """Deliver one bulk request with bounded exponential backoff
    (AmazonElasticsearchSink.java:53-56)."""
    for attempt in range(policy.max_retries + 1):
        try:
            send(chunk)
            return
        except Exception:
            if attempt == policy.max_retries:
                raise
            sleep(policy.backoff_base_s * (2**attempt))


def make_bulk_writer(
    send: Callable[[list[str]], None],
    policy: BulkFlushPolicy = BulkFlushPolicy(),
    es_index: str | None = None,
    es_type: str | None = None,
    es_id_cols: list[str] | None = None,
) -> Callable[[DataFrame, int], None]:
    """Default ``bulk_write`` for :func:`bulk_foreach_batch_sink`.

    Rows are JSON-encoded by Catalyst; each partition then streams
    chunked bulk requests through ``send`` (the client-specific delivery
    callable, e.g. an ES ``_bulk`` POST — must be picklable, it runs on
    executors) under the flush/backoff policy. No driver collection:
    delivery parallelism = partition count.

    With ``es_index`` set, each document is the full ``/_bulk`` line
    pair (:func:`es_bulk_records`, action + newline + source), so a
    chunk joined with newlines (plus the trailing one) IS a valid bulk
    request body; without it, documents are bare row JSON and ``send``
    owns the framing."""

    def bulk_write(batch_df: DataFrame, epoch_id: int) -> None:
        if es_index is not None:
            encoded = es_bulk_records(
                batch_df, es_index, es_type, es_id_cols
            ).select(F.concat_ws("\n", "action", "source").alias("value"))
        else:
            encoded = json_value(batch_df)

        def write_partition(rows) -> None:
            for chunk in bulk_chunks((r["value"] for r in rows), policy):
                send_with_backoff(send, chunk, policy)

        encoded.foreachPartition(write_partition)

    return bulk_write
