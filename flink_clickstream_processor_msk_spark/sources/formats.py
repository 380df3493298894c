"""Multi-format batch sources — parquet / JSON-lines / CSV for the same
logical table.

The reference consumes exactly one source (Kafka+Avro, CP:114-119); a
warehouse-grade engine surface also ingests files (SURVEY §2.2 records the
reference's "file-format scans: No" row). (`sources.tables.read_table`
reads the NAMED fixture tables, parquet-only; this module reads any
PATH in any supported format.) This module keeps format choice
out of the operators: every operator takes a DataFrame, so any table a
pipeline owns can arrive as parquet (the performance path — columnar,
predicate pushdown, column pruning), JSONL (interchange dumps), or CSV
(header + quoted/escaped fields, multiline-safe for embedded newlines in
text columns) and produce IDENTICAL results — pinned by round-trip
equality tests (tests/test_formats.py).

Scale notes: parquet is the only format that prunes columns and pushes
predicates into the scan — JSON/CSV scans read every byte and parse
row-wise, so at 100 TB they are ingest formats, not query formats: land
them once, rewrite to parquet (``convert_to_parquet``), query the parquet.
Schema is explicit for text formats (inference would re-scan the data and
can drift types); a missing schema is an error, not a silent sample pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: shared CSV options: one dict drives BOTH sides so the writer's output
#: and the reader's expectations cannot drift. multiLine+escape round-trip
#: embedded newlines/quotes; the whitespace options disable the WRITER's
#: default trimming (ignore*WhiteSpace default true on write, which
#: silently corrupts text values); the \\N null sentinel disambiguates
#: NULL from the empty string (with the default "" sentinel every empty
#: string reads back as null).
_CSV_COMMON = {
    "header": "true",
    "escape": '"',
    "nullValue": "\\N",
    "ignoreLeadingWhiteSpace": "false",
    "ignoreTrailingWhiteSpace": "false",
}
_CSV_READ = {**_CSV_COMMON, "multiLine": "true", "emptyValue": ""}


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    schema: T.StructType | str | None = None,
) -> DataFrame:
    """Read one logical table from ``path``; ``fmt`` defaults from the
    path suffix (``.parquet`` / ``.json`` / ``.jsonl`` / ``.csv``).

    Parquet carries its own schema; JSON/CSV require an explicit one
    (inference re-scans the data and can silently drift types between
    drops — fail loudly instead)."""
    f = fmt or _infer_format(path)
    if f == "parquet":
        df = spark.read.parquet(path)
        if schema is not None:
            expected = (
                spark.createDataFrame([], schema).schema
                if isinstance(schema, str)
                else schema
            )
            if df.schema != expected:
                raise ValueError(
                    f"parquet schema drift at {path!r}: expected {expected}, "
                    f"found {df.schema}"
                )
        return df
    if schema is None:
        raise ValueError(
            f"{f} source needs an explicit schema (inference re-scans the "
            "data and drifts types between corpus drops)"
        )
    # FAILFAST, not the default PERMISSIVE: a malformed line must error,
    # not become a silent all-null row (the same fail-loudly stance as the
    # mandatory-schema rule above)
    if f == "json":
        return spark.read.schema(schema).option("mode", "FAILFAST").json(path)
    if f == "csv":
        reader = spark.read.schema(schema).option("mode", "FAILFAST")
        for k, v in _CSV_READ.items():
            reader = reader.option(k, v)
        return reader.csv(path)
    raise ValueError(f"unsupported table format: {f!r}")


def write_any(df: DataFrame, path: str, fmt: str | None = None) -> None:
    """Write ``df`` in the format implied by ``path`` (see read_any) —
    the test-pinned inverse of read_any for flat tables."""
    f = fmt or _infer_format(path)
    if f == "parquet":
        df.write.mode("overwrite").parquet(path)
    elif f == "json":
        df.write.mode("overwrite").json(path)
    elif f == "csv":
        writer = df.write.mode("overwrite")
        for k, v in _CSV_COMMON.items():
            writer = writer.option(k, v)
        writer.csv(path)
    else:
        raise ValueError(f"unsupported table format: {f!r}")


def convert_to_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    schema: T.StructType | str | None = None,
    partition_by: tuple[str, ...] = (),
) -> None:
    """The landing step at scale: rewrite an ingest-format drop (JSONL/CSV)
    to parquet once, so every downstream query gets columnar pruning and
    pushdown instead of re-parsing text. Optional hive partitioning by
    low-cardinality columns (e.g. lang) for partition-pruned scans."""
    df = read_any(spark, src_path, schema=schema)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(dst_path)


def _infer_format(path: str) -> str:
    p = path.rstrip("/").lower()
    if p.endswith(".parquet"):
        return "parquet"
    if p.endswith((".json", ".jsonl")):
        return "json"
    if p.endswith(".csv"):
        return "csv"
    raise ValueError(f"cannot infer table format from path: {path!r}")
