"""Partitioning helpers for Python-heavy operators."""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame

_UNITS = {"b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}


def _parse_bytes(v: str) -> int:
    """Parse a Spark byte-size config value ("134217728", "128MB", "4m")."""
    s = v.strip().lower().removesuffix("b")
    if s and s[-1] in _UNITS:
        return int(float(s[:-1]) * _UNITS[s[-1]])
    return int(s)


def _estimated_scan_partitions(df: DataFrame) -> int | None:
    """Estimate the scan's split count from driver-side file metadata —
    ceil(total bytes + per-file open cost / maxPartitionBytes), the
    upper bound on Spark's FilePartition packing (the real maxSplitBytes
    can only be smaller, so this UNDERestimates the partition count and
    errs toward repartitioning — only ever triggered by small inputs,
    where the extra shuffle is cheap). Returns None when the plan has no
    file scan or the files aren't locally stat-able (conservative: treat
    as already-parallel)."""
    files = df.inputFiles()
    if not files:
        return None
    conf = df.sparkSession.conf
    max_bytes = _parse_bytes(conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    open_cost = _parse_bytes(conf.get("spark.sql.files.openCostInBytes", "4m"))
    total = 0
    for uri in files:
        path = uri.removeprefix("file:") if uri.startswith("file:") else uri
        if not path.startswith("/"):
            return None
        try:
            total += os.path.getsize(path) + open_cost
        except OSError:
            return None
    return max(1, math.ceil(total / max_bytes))


def one_slice_rows(spark, rows, schema) -> DataFrame:
    """Driver-local rows as a ONE-slice DataFrame — for sidecars, markers
    and selector tables (bounded, driver-built by construction).

    ``spark.createDataFrame(local_list)`` slices the list into
    ``defaultParallelism`` pickled partitions; a downstream
    ``coalesce(1)`` write then drains all of them SEQUENTIALLY in one
    task at ~0.15 s of Python-runner round trip EACH — measured 4.6 s
    for a ONE-ROW sidecar write on local[32] vs 0.25 s with one slice
    (r17; this fixed cost was ~90 % of the r16 "append floor" and is
    pure slicing artifact, not data). One slice is the honest shape for
    driver-local bounded rows at any scale (guide §1.2/§4)."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(list(rows), 1), schema
    )


def parallelized(df: DataFrame) -> DataFrame:
    """Ensure at least default-parallelism partitions before Python-heavy
    per-row compute (batch only).

    A small parquet table arrives as one input split, which would run
    Arrow-batched pandas UDFs on a single core; at 100 TB inputs already
    carry more partitions than cores and this is a no-op. The decision is
    made from driver-side file metadata (no plan-to-RDD conversion — the
    old getNumPartitions probe forced a physical-planning round trip per
    operator call)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    est = _estimated_scan_partitions(df)
    if est is not None and est < target:
        return df.repartition(target)
    return df
