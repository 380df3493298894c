"""The vectorized (numpy pandas-UDF) ANN index builders must agree
bit-for-bit with the per-row Catalyst spec expressions they replace —
the spec expressions are what the DuckDB oracles mirror, so builder/spec
equality is what keeps the ANN CORRECTNESS rows green."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_clickstream_processor_msk_spark.operators.dedup import (
    N_PLANES,
    build_lsh_index,
    embedding_lsh_bucket,
    hyperplanes,
)
from flink_clickstream_processor_msk_spark.operators.similarity import (
    N_CENTROIDS,
    ann_ivf_topk,
    ann_lsh_topk,
    build_ivf_index,
    ivf_cells,
    ivf_centroids,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_lsh_index_matches_catalyst_buckets(spark):
    emb = _emb(spark)
    planes = hyperplanes(N_PLANES, dim=64)
    spec = {
        r["vec_id"]: r["bucket"]
        for r in emb.select(
            "vec_id",
            embedding_lsh_bucket("cast(embedding as array<double>)", planes).alias(
                "bucket"
            ),
        ).collect()
    }
    got = {
        r["vec_id"]: r["bucket"] for r in build_lsh_index(emb).select("vec_id", "bucket").collect()
    }
    assert got == spec
    spark.catalog.clearCache()


def test_ivf_index_matches_catalyst_cells(spark):
    emb = _emb(spark)
    cents = ivf_centroids(emb, N_CENTROIDS)
    spec = {
        r["vec_id"]: r["cell"]
        for r in ivf_cells(emb, cents).select("vec_id", "cell").collect()
    }
    built_cents, index = build_ivf_index(emb)
    assert built_cents == cents
    got = {r["vec_id"]: r["cell"] for r in index.select("vec_id", "cell").collect()}
    assert got == spec
    spark.catalog.clearCache()


def _explain_str(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_saved_ivf_index_roundtrip_and_partition_pruning(spark, tmp_path):
    """A written index must (a) return identical top-k and (b) let the
    probe's cell filter become partition pruning — the 100 TB story."""
    from flink_clickstream_processor_msk_spark.operators import similarity

    emb = _emb(spark)
    path = str(tmp_path / "ivf")
    similarity.save_ivf_index(emb, path)
    loaded = similarity.load_ivf_index(spark, path)
    probe = ann_ivf_topk(emb, 0, 10, index=loaded)
    assert probe.collect() == ann_ivf_topk(emb, 0, 10).collect()
    plan = _explain_str(probe)
    assert "PartitionFilters" in plan
    assert "PartitionFilters: []" not in plan  # the cell filter prunes
    spark.catalog.clearCache()


def test_saved_lsh_index_roundtrip_and_partition_pruning(spark, tmp_path):
    from flink_clickstream_processor_msk_spark.operators import similarity

    emb = _emb(spark)
    path = str(tmp_path / "lsh")
    similarity.save_lsh_index(emb, path)
    loaded = similarity.load_lsh_index(spark, path)
    probe = ann_lsh_topk(emb, 0, 10, index=loaded)
    assert probe.collect() == ann_lsh_topk(emb, 0, 10).collect()
    plan = _explain_str(probe)
    assert "PartitionFilters" in plan
    assert "PartitionFilters: []" not in plan  # popcount-on-bucket prunes
    spark.catalog.clearCache()


def test_saved_ivfpq_composed_layout_joinless_probe(spark, tmp_path):
    """The composed IVFADC written table (cell + codes in one row): the
    probe must (a) return the identical top-k as the separate-index
    composition, (b) prune cell partitions, and (c) contain NO join —
    the layout's whole point is that routing and scoring read the same
    row."""
    from flink_clickstream_processor_msk_spark.operators import similarity

    emb = _emb(spark)
    path = str(tmp_path / "ivfpq")
    similarity.save_ivfpq_index(emb, path)
    composed = similarity.load_ivfpq_index(spark, path)
    probe = similarity.ann_ivfpq_topk(emb, 0, 10, composed_index=composed)
    assert probe.collect() == similarity.ann_ivfpq_topk(emb, 0, 10).collect()
    plan = _explain_str(probe)
    assert "PartitionFilters" in plan
    assert "PartitionFilters: []" not in plan  # the n_probe cells prune
    assert "Join" not in plan  # routing + ADC read the same written row
    spark.catalog.clearCache()


def test_ann_topk_same_with_prebuilt_index(spark):
    """Probing a pre-built index returns the identical top-k as the
    build-inline path (amortization must not change results)."""
    emb = _emb(spark)
    inline = ann_lsh_topk(emb, 0, 10).collect()
    prebuilt = ann_lsh_topk(emb, 0, 10, index=build_lsh_index(emb)).collect()
    assert inline == prebuilt
    inline = ann_ivf_topk(emb, 0, 10).collect()
    prebuilt = ann_ivf_topk(emb, 0, 10, index=build_ivf_index(emb)).collect()
    assert inline == prebuilt
    spark.catalog.clearCache()


def test_kmeans_refined_centroids_match_duckdb_unroll(spark):
    """The rounded per-iteration centroids must be BIT-IDENTICAL between
    the Spark refinement and the DuckDB oracle's unrolled CTEs — routing
    (cell assignment + probe choice) diverges otherwise and the
    sim_ann_ivf_kmeans_topk CORRECTNESS row goes red."""
    import duckdb

    from flink_clickstream_processor_msk_spark.oracles_beyond import (
        ann_ivf_kmeans_topk as kmeans_oracle,
    )
    from flink_clickstream_processor_msk_spark.operators.similarity import (
        kmeans_refine_centroids,
    )

    emb = _emb(spark)
    seed = ivf_centroids(emb, N_CENTROIDS)
    refined = kmeans_refine_centroids(emb, seed, iterations=2)

    sql = kmeans_oracle(0, 10)
    # evaluate just the cents2 CTE of the oracle
    cents_sql = sql[: sql.index("q AS (SELECT")].rstrip().rstrip(",")
    cents_sql += "\nSELECT cidx, cvec FROM cents2 ORDER BY cidx"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
    )
    oracle_cents = [list(map(float, r[1])) for r in con.execute(cents_sql).fetchall()]
    con.close()
    assert refined == oracle_cents
    spark.catalog.clearCache()


def test_kmeans_refine_partition_independent(spark):
    """The round-7 determinism contract: refined centroids must be
    IDENTICAL regardless of how the input is partitioned — the per-dim
    sums run over scaled integers (KMEANS_SUM_SCALE), so no shuffle
    order can move a mean across a rounding-grid boundary. (The
    pre-round-7 double sums were exactly the thing this would flip.)"""
    from flink_clickstream_processor_msk_spark.operators.similarity import (
        kmeans_refine_centroids,
        pq_refine_codebooks,
    )

    emb = _emb(spark)
    seed = ivf_centroids(emb, N_CENTROIDS)
    shapes = [emb.coalesce(1), emb.repartition(3), emb.repartition(13)]
    ivf_results = [
        kmeans_refine_centroids(df, seed, iterations=2) for df in shapes
    ]
    assert ivf_results[0] == ivf_results[1] == ivf_results[2]
    pq_results = [pq_refine_codebooks(df, iterations=1) for df in shapes]
    assert pq_results[0] == pq_results[1] == pq_results[2]
    spark.catalog.clearCache()


def test_kmeans_refine_deterministic_and_shape(spark):
    from flink_clickstream_processor_msk_spark.operators.similarity import (
        build_ivf_index,
        kmeans_refine_centroids,
    )

    emb = _emb(spark)
    seed = ivf_centroids(emb, N_CENTROIDS)
    a = kmeans_refine_centroids(emb, seed, iterations=2)
    b = kmeans_refine_centroids(emb, seed, iterations=2)
    assert a == b  # deterministic
    assert len(a) == N_CENTROIDS and all(len(c) == 64 for c in a)
    assert a != seed  # it actually moved the centroids

    # a refined index still produces exact cosines for whatever it returns
    from flink_clickstream_processor_msk_spark.operators.similarity import cosine_topk

    cents, index = build_ivf_index(emb, centroids=a)
    got = ann_ivf_topk(emb, 0, 10, index=(cents, index)).collect()
    exact = {r["vec_id"]: r["cosine"] for r in cosine_topk(_emb(spark), 0, 500).collect()}
    assert len(got) == 10
    for r in got:
        assert exact[r["vec_id"]] == r["cosine"]  # scores are exact folds
    spark.catalog.clearCache()


def test_saved_pq_index_roundtrip(spark, tmp_path):
    """A written PQ index (codes + codebooks sidecar) returns identical
    ADC top-k to the in-memory build — for both the deterministic seed
    codebooks and the Lloyd's-refined build."""
    from flink_clickstream_processor_msk_spark.operators import similarity

    emb = _emb(spark)
    path = str(tmp_path / "pq")
    similarity.save_pq_index(emb, path)
    loaded = similarity.load_pq_index(spark, path)
    want_cbs, want_codes = similarity.build_pq_index(emb)
    assert loaded[0] == want_cbs
    got = similarity.ann_pq_topk(emb, 0, 10, index=loaded).collect()
    assert got == similarity.ann_pq_topk(emb, 0, 10, index=(want_cbs, want_codes)).collect()

    refined = similarity.pq_refine_codebooks(emb, iterations=1)
    rpath = str(tmp_path / "pq_refined")
    similarity.save_pq_index(emb, rpath, codebooks=refined)
    rloaded = similarity.load_pq_index(spark, rpath)
    assert rloaded[0] == refined
    spark.catalog.clearCache()


def test_saved_pairs_table_feeds_families_and_cleaning(spark, tmp_path):
    """The written near-dup pairs table — build once, write, read back —
    gives byte-identical duplicate families and clean-corpus output to
    the inline pipeline (the pairs analog of the saved ANN indexes)."""
    from flink_clickstream_processor_msk_spark.operators import dedup
    from flink_clickstream_processor_msk_spark.operators.pipeline import clean_corpus

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = dedup.minhash_near_duplicates(docs, max_bucket_size=None)
    path = str(tmp_path / "pairs")
    dedup.save_pairs(pairs, path)
    loaded = dedup.load_pairs(spark, path)
    assert sorted(map(tuple, loaded.collect())) == sorted(map(tuple, pairs.collect()))

    want_fam = sorted(
        map(tuple, dedup.minhash_duplicate_families(
            docs, max_bucket_size=None, pairs=pairs).collect())
    )
    got_fam = sorted(
        map(tuple, dedup.minhash_duplicate_families(
            docs, max_bucket_size=None, pairs=loaded).collect())
    )
    assert got_fam == want_fam
    want_clean = sorted(
        map(tuple, clean_corpus(docs, pairs=pairs).collect())
    )
    got_clean = sorted(
        map(tuple, clean_corpus(docs, pairs=loaded).collect())
    )
    assert got_clean == want_clean
    spark.catalog.clearCache()
