"""Shared column-level functions (all JVM-side Catalyst expressions)."""

from flink_clickstream_processor_msk_spark.functions.predicates import (
    is_checkout,
    is_real_product,
)
from flink_clickstream_processor_msk_spark.functions.latch import checkout_latch

__all__ = ["is_real_product", "is_checkout", "checkout_latch"]
