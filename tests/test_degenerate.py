"""Degenerate-input hardening (VERDICT r6 #5): empty tables, all-null
text, single-row corpora, and short inputs (n_rows < n_centroids / k_cb)
through the index build paths. The contract: clear ValueError where an
artifact cannot exist (index over nothing), graceful empty/small results
everywhere else — never an IndexError/py4j crash from inside a plan."""

from __future__ import annotations

import pytest

from flink_clickstream_processor_msk_spark.operators import (
    dedup,
    pipeline,
    similarity,
    text,
)

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOCS_SCHEMA)


def _emb(spark, rows):
    return spark.createDataFrame(rows, EMB_SCHEMA)


# --- empty / short embeddings through the ANN builds ----------------------


def test_empty_embeddings_raise_clear_errors(spark):
    empty = _emb(spark, [])
    with pytest.raises(ValueError, match="empty embeddings"):
        similarity.build_ivf_index(empty)
    with pytest.raises(ValueError, match="empty embeddings"):
        similarity.build_pq_index(empty)
    with pytest.raises(ValueError, match="empty centroid"):
        similarity.kmeans_refine_centroids(empty, [])


def _short_embeddings(spark, n, dim=64):
    rows = [
        (i, [float((i * 37 + d * 13) % 7 - 3) for d in range(dim)], 0)
        for i in range(n)
    ]
    return _emb(spark, rows)


def test_short_input_ivf_build_and_probe(spark):
    """5 rows < N_CENTROIDS(16): the index gets 5 cells, refinement and
    probes still work, and the probe returns the other rows exactly (5
    cells with n_probe=4 cover ≥4 of them)."""
    emb = _short_embeddings(spark, 5)
    cents, index = similarity.build_ivf_index(emb)
    assert len(cents) == 5
    refined = similarity.kmeans_refine_centroids(emb, cents, iterations=1)
    assert len(refined) == 5
    got = similarity.ann_ivf_topk(emb, 0, k=10, index=(cents, index)).collect()
    assert 1 <= len(got) <= 4
    assert all(r["vec_id"] != 0 for r in got)


def test_short_input_pq_build_and_probe(spark):
    """3 rows < PQ_K: sub-codebooks have 3 centroids each; codes stay in
    range; the ADC probe scores the other rows without crashing."""
    emb = _short_embeddings(spark, 3)
    cbs, index = similarity.build_pq_index(emb)
    assert all(len(cb) == 3 for cb in cbs)
    codes = index.collect()
    assert all(0 <= c < 3 for r in codes for c in r["codes"])
    refined = similarity.pq_refine_codebooks(emb, iterations=1)
    assert all(len(cb) == 3 for cb in refined)
    got = similarity.ann_pq_topk(emb, 0, k=10, index=(cbs, index)).collect()
    assert len(got) == 2


def test_single_row_embeddings_probe_is_empty(spark):
    emb = _short_embeddings(spark, 1)
    cents, index = similarity.build_ivf_index(emb)
    assert similarity.ann_ivf_topk(emb, 0, k=10, index=(cents, index)).count() == 0
    cbs, pq_index = similarity.build_pq_index(emb)
    assert similarity.ann_pq_topk(emb, 0, k=10, index=(cbs, pq_index)).count() == 0


def test_narrow_embedding_dim_vs_subspaces_raises(spark):
    emb = _emb(spark, [(0, [1.0, 2.0], 0)])  # dim 2 < PQ_M subspaces
    with pytest.raises(ValueError, match="smaller than m"):
        similarity.build_pq_index(emb)


# --- empty / degenerate documents through text + dedup --------------------


def test_empty_documents_all_ops_return_empty(spark):
    empty = _docs(spark, [])
    for op in (
        text.text_stats,
        text.charset_stats,
        text.language_id,
        text.quality_filter,
        text.token_histogram,
        text.fingerprints,
        dedup.exact_duplicates,
        lambda df: dedup.minhash_near_duplicates(df, max_bucket_size=None),
        dedup.simhash_near_duplicates,
        dedup.dedup_graph_stats,
        pipeline.clean_corpus,
        pipeline.decontaminate,
    ):
        assert op(empty).count() == 0

    # profile_table over zero rows still profiles: one row per column,
    # counts at 0
    prof = text.profile_table(empty, ["text", "lang"]).collect()
    assert len(prof) == 2
    assert all(r["n_nonnull"] == 0 for r in prof)


def test_all_null_text_corpus(spark):
    docs = _docs(
        spark,
        [(i, None, "en", "web", 0) for i in range(4)],
    )
    # shingle/minhash pipelines: null text propagates to no shingles ->
    # no candidate pairs, no crash
    assert dedup.minhash_near_duplicates(docs, max_bucket_size=None).count() == 0
    assert dedup.simhash_near_duplicates(docs).count() == 0
    # exact dedup groups null contents together (SQL GROUP BY semantics —
    # the DuckDB oracle twin does the same; pinned so a refactor cannot
    # silently flip it)
    groups = dedup.exact_duplicates(docs).collect()
    assert len(groups) == 1 and groups[0]["group_size"] == 4
    # per-row text ops emit a row per document without crashing
    assert text.text_stats(docs).count() == 4
    assert text.language_id(docs).count() == 4
    # charset_stats excludes NULL text entirely (its oracle's WHERE)
    assert text.charset_stats(docs).count() == 0
    # no pairs -> the graph audit is empty, not a crash
    assert dedup.dedup_graph_stats(docs).count() == 0


def test_single_document_corpus(spark):
    docs = _docs(spark, [(1, "the quick brown fox jumps over the lazy dog", "en", "web", 43)])
    assert dedup.minhash_near_duplicates(docs, max_bucket_size=None).count() == 0
    fams = dedup.minhash_duplicate_families(docs, max_bucket_size=None)
    # a lone document is its own family representative (or absent) — it
    # must never be dropped by the cleaner's near-dup stage
    kept = pipeline.clean_corpus(docs, min_quality=0.0, min_tokens=1)
    assert [r["doc_id"] for r in kept.collect()] == [1]
    assert fams.filter("doc_id != family_rep").count() == 0
