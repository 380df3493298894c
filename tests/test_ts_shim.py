"""Pin all three `ts` physical-shape branches of the clickevent source shim
(sources/clickevents.clickevents_from_events).

The driver has regenerated events.parquet with different physical types
across rounds (TIMESTAMP(NANOS) → timestamp[us]/NTZ), and only the branch
matching the current data is exercised by the driver — the other two would
rot silently. Each test writes a synthetic events.parquet in one shape and
asserts the shim produces identical epoch-millis event times (truncation
semantics included: sub-millisecond parts drop, matching DuckDB epoch_ms).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

from flink_clickstream_processor_msk_spark.sources.clickevents import (
    read_clickevents,
)

# epoch-microseconds with non-zero sub-millisecond parts (truncation check)
_MICROS = [0, 1_700_000_000_123_456, 1_700_000_000_999_999, 86_400_000_001]
_EXPECT_MILLIS = [u // 1000 for u in _MICROS]


def _write_events(tmp_path, name: str, ts_array: pa.Array) -> str:
    n = len(_MICROS)
    table = pa.table(
        {
            "ts": ts_array,
            "event_type": pa.array(
                (["view", "click", "purchase", "view"] * n)[:n], pa.string()
            ),
            "user_id": pa.array(range(1, n + 1), pa.int32()),
            "event_id": pa.array(range(10, 10 + n), pa.int64()),
        }
    )
    d = tmp_path / name
    d.mkdir()
    pq.write_table(table, str(d / "events.parquet"))
    return str(d)


def _shim_millis(spark, sf_dir: str, expected_ts_type) -> list[int]:
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    actual = raw.schema["ts"].dataType
    assert isinstance(actual, expected_ts_type), (
        f"fixture did not produce the intended physical shape: {actual}"
    )
    out = read_clickevents(spark, sf_dir).orderBy("globalseq").collect()
    return [r["eventtimestamp"] for r in out]


def test_ts_ntz_branch(spark, tmp_path):
    """timestamp[us] without zone — the current driver shape."""
    d = _write_events(tmp_path, "ntz", pa.array(_MICROS, pa.timestamp("us")))
    assert _shim_millis(spark, d, TimestampNTZType) == _EXPECT_MILLIS


def test_ts_nanos_as_long_branch(spark, tmp_path):
    """TIMESTAMP(NANOS) parquet read as long via the legacy conf — the
    overflow-safe integer-DIV path (never `/`: 2^53 double precision)."""
    nanos = pa.array([u * 1000 for u in _MICROS], pa.timestamp("ns"))
    d = _write_events(tmp_path, "nanos", nanos)
    assert _shim_millis(spark, d, LongType) == _EXPECT_MILLIS


def test_ts_tz_aware_branch(spark, tmp_path):
    """tz-aware TIMESTAMP — plain unix_millis."""
    tz = pa.array(_MICROS, pa.timestamp("us", tz="UTC"))
    d = _write_events(tmp_path, "ltz", tz)
    assert _shim_millis(spark, d, TimestampType) == _EXPECT_MILLIS


def test_ts_ntz_branch_is_session_timezone_independent(spark, tmp_path):
    """NTZ wall-clock is treated as UTC regardless of session timezone (a
    cast to TIMESTAMP would shift with the session zone)."""
    d = _write_events(tmp_path, "ntz_tz", pa.array(_MICROS, pa.timestamp("us")))
    orig = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        assert _shim_millis(spark, d, TimestampNTZType) == _EXPECT_MILLIS
    finally:
        spark.conf.set("spark.sql.session.timeZone", orig)
