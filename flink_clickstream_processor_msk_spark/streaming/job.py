"""Application shell — the reference's ``main()`` (CP:57-272), Spark-first.

Wires: config validation → Kafka Avro source → Q1 session aggregation →
{buy-filter, Q2, Q3} → three Kafka JSON sinks. Each output runs as its own
streaming query with an isolated checkpoint (multi-query fan-out; a
replayable source makes re-execution of the shared sessionization plan
correct, and keeps each sink's failure domain independent — the same
isolation the reference gets from Flink operator chains).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from flink_clickstream_processor_msk_spark.config import AppConfig
from flink_clickstream_processor_msk_spark.sources.clickevents import (
    kafka_clickevents,
)
from flink_clickstream_processor_msk_spark.streaming.pipeline import build_streams
from flink_clickstream_processor_msk_spark.streaming.sinks import kafka_json_sink


def run(spark: SparkSession, config: AppConfig) -> list[StreamingQuery]:
    """Start the full job; returns the three streaming queries.

    Reference parity: CP:92-98 config validation; CP:114-119 source;
    CP:208-251 sinks (departments keyed by departmentName, others
    round-robin).
    """
    config.validate()
    servers = config["BootstrapServers"]
    ckpt = config["CheckpointDir"]

    clickevents = kafka_clickevents(
        spark,
        bootstrap_servers=servers,
        topic=config["InputTopic"],
        watermark=config["Watermark"],
    )
    streams = build_streams(
        clickevents, gap=config["SessionGap"], window=config["TumblingWindow"]
    )

    return [
        kafka_json_sink(
            streams.department_counts,
            servers,
            config["DepartmentsAggTopic"],
            f"{ckpt}/departments",
            key_cols=["departmentName"],  # K1: keyed, CP:208-227
            timestamp_col="windowEndTime",  # setWriteTimestampToKafka, CP:226
        ),
        kafka_json_sink(
            streams.session_stats,
            servers,
            config["SessionStatsTopic"],
            f"{ckpt}/session_stats",  # K2: round-robin, CP:231-239
            timestamp_col="windowEndTime",  # setWriteTimestampToKafka, CP:239
        ),
        kafka_json_sink(
            streams.buy_sessions,
            servers,
            config["BuySessionsTopic"],
            f"{ckpt}/buy_sessions",  # K3: round-robin, CP:243-251
            timestamp_col="windowEndTime",  # setWriteTimestampToKafka, CP:251
        ),
    ]
