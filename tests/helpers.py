"""Builders for synthetic ClickEvent DataFrames."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_clickstream_processor_msk_spark.schema import CLICK_EVENT
from flink_clickstream_processor_msk_spark.sources.clickevents import with_event_time

BASE_TS = 1_700_000_000_000  # 2023-11-14T22:13:20Z, epoch millis


def make_clickevents(spark: SparkSession, events: list[dict]) -> DataFrame:
    """events: dicts with ts (ms), seq, userid, event_type, product_type."""
    rows = [
        (
            "0.0.0.0",
            int(e["ts"]),
            "desktop",
            e.get("event_type"),
            e.get("product_type"),
            int(e.get("userid", 1)),
            int(e["seq"]),
            int(e["seq"]) - 1,
        )
        for e in events
    ]
    return with_event_time(spark.createDataFrame(rows, CLICK_EVENT))
