"""Partitioning helpers for Python-heavy operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def parallelized(df: DataFrame) -> DataFrame:
    """Ensure at least default-parallelism partitions before Python-heavy
    per-row compute (batch only).

    A small parquet table arrives as one input split, which would run
    Arrow-batched pandas UDFs on a single core; at 100 TB inputs already
    carry more partitions than cores and this is a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
