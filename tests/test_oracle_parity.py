"""Every declared driver query must hash-match its DuckDB oracle.

Local replica of the driver's t2 correctness gate (BASELINE.md), run at
sf0.001 for speed; the driver runs the same comparison at sf0.01.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from conftest import SF_SMOKE
from oracle_utils import compare, duckdb_connect


@pytest.fixture(scope="module")
def con():
    c = duckdb_connect(SF_SMOKE)
    yield c
    c.close()


def test_every_query_has_matching_keys():
    assert set(entry_mod.oracle_sql()).issubset(set(entry_mod.queries()))


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql()))
def test_query_matches_oracle(spark, con, name):
    spark_df = entry_mod.queries()[name](spark, SF_SMOKE)
    oracle_pdf = con.execute(entry_mod.oracle_sql()[name]).df()
    result = compare(spark_df, oracle_pdf)
    assert result["ok"], result


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_no_array_columns_in_driver_output(spark, name):
    """The driver canonicalizer can't sort array/struct cells (round-1 q1_*
    red rows) — every driver-facing schema must be scalar-only."""
    from pyspark.sql import types as T

    schema = entry_mod.queries()[name](spark, SF_SMOKE).schema
    complex_cols = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not complex_cols, f"{name} exposes non-scalar columns: {complex_cols}"
