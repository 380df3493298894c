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


def test_csv_round_trip_preserves_whitespace_empty_and_null(spark, tmp_path):
    """The fidelity boundaries CSV defaults corrupt: leading/trailing
    whitespace must survive (writer trim disabled), the empty string must
    stay '' (not become null), and NULL must stay NULL (sentinel)."""
    rows = [
        (0, "  leading and trailing  ", "en", "s", 24),
        (1, "", "en", "s", 0),
        (2, None, "en", "s", 0),
        (3, "tail newline\n", "en", "s", 13),
        (4, 'quote " and, comma', "en", "s", 18),
    ]
    df = spark.createDataFrame(rows, DOCS_SCHEMA)
    path = str(tmp_path / "edge.csv")
    formats.write_any(df, path)
    got = {r["doc_id"]: r["text"] for r in formats.read_any(
        spark, path, schema=DOCS_SCHEMA).collect()}
    assert got == {i: t for i, t, *_ in rows}


def test_malformed_text_row_fails_fast(spark, tmp_path):
    """A garbled JSONL line must ERROR (FAILFAST), never become a silent
    all-null row flowing into the pipeline."""
    import pytest as _pytest

    path = tmp_path / "bad"
    path.mkdir()
    (path / "part-0.jsonl").write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "{this is not json\n"
    )
    with _pytest.raises(Exception, match="FAILFAST|Malformed|malformed"):
        formats.read_any(spark, str(path), fmt="json", schema=DOCS_SCHEMA).collect()


def test_parquet_schema_drift_detected(spark, tmp_path):
    """An explicitly-passed schema is ENFORCED on parquet too — a type
    drift in a new drop raises instead of propagating."""
    import pytest as _pytest

    path = str(tmp_path / "drift.parquet")
    spark.createDataFrame(
        [(1, "x", "en", "s", 1.0)],
        "doc_id long, text string, lang string, source string, n_chars double",
    ).write.parquet(path)
    with _pytest.raises(ValueError, match="schema drift"):
        formats.read_any(spark, path, schema=DOCS_SCHEMA)
    # matching schema passes
    assert formats.read_any(
        spark, f"{SF_SMOKE}/documents.parquet", schema=DOCS_SCHEMA
    ).count() > 0
