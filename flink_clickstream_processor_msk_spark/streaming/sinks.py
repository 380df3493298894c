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

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def json_value(df: DataFrame) -> DataFrame:
    """Encode all columns as one JSON string column ``value`` (X1 parity:
    the reference Gson-encodes each POJO, CP:40-43)."""
    return df.select(F.to_json(F.struct(*df.columns)).alias("value"))


def kafka_records(df: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """Kafka message encoding (K1-K3): value = JSON of the whole row; key =
    JSON of ``key_cols`` (Kafka then hash-partitions by it, CP:211-215) or
    absent for round-robin (CP:231-251)."""
    cols = [F.to_json(F.struct(*df.columns)).alias("value")]
    if key_cols:
        cols.insert(0, F.to_json(F.struct(*key_cols)).alias("key"))
    return df.select(*cols)


def kafka_json_sink(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
    key_cols: list[str] | None = None,
    output_mode: str = "append",
) -> StreamingQuery:
    """K1-K3 parity: JSON-valued Kafka sink, keyed (hash-partitioned) when
    ``key_cols`` is given, round-robin otherwise.

    Requires spark-sql-kafka on the classpath (not bundled here; the
    message encoding is tested in batch via :func:`kafka_records`).
    """
    return (
        kafka_records(df, key_cols)
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
