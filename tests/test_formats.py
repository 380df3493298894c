"""Multi-format source round-trips: the same logical table read from
parquet, JSONL, and CSV must produce IDENTICAL operator results —
format choice never changes semantics (sources/formats.py contract).
"""

from __future__ import annotations

import pytest

from conftest import SF_SMOKE
from flink_clickstream_processor_msk_spark.operators import text
from flink_clickstream_processor_msk_spark.sources import formats

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars bigint"


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def docs_in_three_formats(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("formats")
    parquet_path = f"{SF_SMOKE}/documents.parquet"
    docs = spark.read.parquet(parquet_path)
    json_path = str(base / "documents.jsonl")
    csv_path = str(base / "documents.csv")
    formats.write_any(docs, json_path)
    formats.write_any(docs, csv_path)
    return parquet_path, json_path, csv_path


def test_round_trip_rows_identical(spark, docs_in_three_formats):
    """Byte-level row equality across all three formats — including CSV
    with embedded quotes/newlines in the text column (multiLine+escape)."""
    parquet_path, json_path, csv_path = docs_in_three_formats
    want = _canon(formats.read_any(spark, parquet_path))
    assert _canon(formats.read_any(spark, json_path, schema=DOCS_SCHEMA)) == want
    assert _canon(formats.read_any(spark, csv_path, schema=DOCS_SCHEMA)) == want


def test_operator_results_format_invariant(spark, docs_in_three_formats):
    """A representative operator (text_stats: tokenization, ratios, doubles)
    gives identical output whichever format the table arrived in."""
    parquet_path, json_path, csv_path = docs_in_three_formats
    want = _canon(text.text_stats(formats.read_any(spark, parquet_path)))
    got_json = _canon(
        text.text_stats(formats.read_any(spark, json_path, schema=DOCS_SCHEMA))
    )
    got_csv = _canon(
        text.text_stats(formats.read_any(spark, csv_path, schema=DOCS_SCHEMA))
    )
    assert got_json == want
    assert got_csv == want


def test_text_formats_require_schema(spark, docs_in_three_formats):
    _, json_path, _ = docs_in_three_formats
    with pytest.raises(ValueError, match="explicit schema"):
        formats.read_any(spark, json_path)


def test_convert_to_parquet_lands_partitioned(spark, docs_in_three_formats, tmp_path):
    """The landing step: JSONL drop -> lang-partitioned parquet; a
    lang-filtered scan then prunes partitions (PartitionFilters)."""
    _, json_path, _ = docs_in_three_formats
    dst = str(tmp_path / "landed.parquet")
    formats.convert_to_parquet(
        spark, json_path, dst, schema=DOCS_SCHEMA, partition_by=("lang",)
    )
    landed = spark.read.parquet(dst)
    q = landed.filter(landed.lang == "en").select("doc_id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan
    want = {
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .filter("lang = 'en'")
        .collect()
    }
    assert {r["doc_id"] for r in q.collect()} == want
