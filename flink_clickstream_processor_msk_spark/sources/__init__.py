"""Sources: batch parquet tables + the clickevents shim + streaming readers."""

from flink_clickstream_processor_msk_spark.sources.clickevents import (
    clickevents_from_events,
    read_clickevents,
)
from flink_clickstream_processor_msk_spark.sources.tables import read_table

__all__ = ["clickevents_from_events", "read_clickevents", "read_table"]
