"""Local replica of the driver's Spark-vs-DuckDB correctness gate.

Runs a queries() callable and its oracle_sql() string side by side on a
test tier, then compares row count, column names, and an order-insensitive
canonical value hash (lists canonicalized to JSON, floats rounded to 9
significant digits to absorb representation noise — the driver hashes
canonical serializations per FIXTURES.md §5).
"""

from __future__ import annotations

import hashlib
import json
import math

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_cell(v):
    if isinstance(v, (list, tuple, np.ndarray)):
        return [_canon_cell(x) for x in v]
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        if f == 0:
            return 0.0
        return float(f"{f:.9g}")
    if pd.isna(v):
        return None
    if isinstance(v, (np.bool_, bool)):
        return bool(v)
    return v


def canonical_hash(df: pd.DataFrame) -> str:
    cols = sorted(df.columns)
    rows = [
        json.dumps([_canon_cell(row[c]) for c in cols], default=str)
        for _, row in df.iterrows()
    ]
    rows.sort()
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()


def _reject_array_cells(pdf: pd.DataFrame, side: str) -> None:
    """The driver's canonicalizer sorts rows with pandas ``sort_values``,
    which raises ``TypeError: unhashable type: 'list'`` on array cells
    (round-1 q1_* failures). Fail local-side the same way the driver would,
    so local green predicts driver green."""
    for c in pdf.columns:
        col = pdf[c]
        # non-object dtypes (ints, floats, bools, datetimes) cannot hold
        # list cells; scan ALL rows of object-dtype columns — a frame whose
        # leading rows are null/scalar can still hide arrays further down
        if col.dtype != object:
            continue
        for v in col:
            if isinstance(v, (list, tuple, np.ndarray, dict)):
                raise TypeError(
                    f"{side} column {c!r} contains array/struct cells — the "
                    "driver canonicalizer cannot sort them; emit a "
                    "deterministic scalar (e.g. comma-joined string) instead"
                )


def compare(spark_df, oracle_pdf: pd.DataFrame) -> dict:
    spark_pdf = spark_df.toPandas()
    _reject_array_cells(spark_pdf, "spark")
    _reject_array_cells(oracle_pdf, "oracle")
    result = {
        "spark_rows": len(spark_pdf),
        "oracle_rows": len(oracle_pdf),
        "spark_cols": sorted(spark_pdf.columns),
        "oracle_cols": sorted(oracle_pdf.columns),
    }
    result["rows_match"] = result["spark_rows"] == result["oracle_rows"]
    result["cols_match"] = result["spark_cols"] == result["oracle_cols"]
    result["hash_match"] = (
        result["cols_match"]
        and canonical_hash(spark_pdf) == canonical_hash(oracle_pdf)
    )
    result["ok"] = result["rows_match"] and result["cols_match"] and result["hash_match"]
    return result
