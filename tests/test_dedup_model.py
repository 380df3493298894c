"""Property tests: Spark dedup pipelines vs pure-Python executable models.

The MinHash-LSH pipeline and the SimHash fingerprint are replicated
step-for-step in plain Python (same md5-derived hashes, same permutation
coefficients, same banding); hypothesis drives random documents through
both and the results must match exactly — the same discipline the latch
gets in test_latch.py.
"""

from __future__ import annotations

import hashlib

from hypothesis import given, settings, strategies as st

from flink_clickstream_processor_msk_spark.functions.hashing import (
    H28_MOD,
    MOD_P,
    perm_coefficients,
)
from flink_clickstream_processor_msk_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    N_BANDS,
    N_PERMS,
    SIMHASH_BITS,
    minhash_near_duplicates,
    simhash,
)

VOCAB = ["spark", "flink", "stream", "batch", "query", "engine", "scale", "data"]


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _tokens(text: str) -> list[str]:
    return [t for t in text.split() if t]


def _shingles(words: list[str], k: int = 3) -> list[str]:
    n = max(len(words) - k + 1, 1)
    return [" ".join(words[i : i + k]) for i in range(n)]


def _model_minhash_pairs(texts: list[str]) -> dict[tuple[int, int], float]:
    coeffs = perm_coefficients(N_PERMS)
    rows = N_PERMS // N_BANDS
    shsets = {
        i: {_h60(s) % H28_MOD for s in _shingles(_tokens(t))}
        for i, t in enumerate(texts)
    }
    sigs = {
        i: [min((a * h + b) % MOD_P for h in sh) for a, b in coeffs]
        for i, sh in shsets.items()
    }
    buckets: dict[tuple[int, str], list[int]] = {}
    for i, sig in sigs.items():
        for b in range(N_BANDS):
            key = "-".join(str(x) for x in sig[b * rows : (b + 1) * rows])
            buckets.setdefault((b, key), []).append(i)
    pairs = set()
    for members in buckets.values():
        for a in members:
            for b in members:
                if a < b:
                    pairs.add((a, b))
    out = {}
    for a, b in pairs:
        sa, sb = shsets[a], shsets[b]
        j = len(sa & sb) / len(sa | sb)
        if j >= JACCARD_THRESHOLD:
            out[(a, b)] = j
    return out


def _model_simhash(text: str) -> int:
    hashes = [_h60(t) for t in _tokens(text)]
    fp = 0
    for i in range(SIMHASH_BITS):
        votes = sum(1 if (h >> i) & 1 else -1 for h in hashes)
        if votes > 0:
            fp |= 1 << i
    return fp


docs_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=12).map(" ".join),
    min_size=2,
    max_size=6,
)


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


@settings(max_examples=5, deadline=None)
@given(docs_strategy)
def test_minhash_pipeline_matches_model(spark, texts):
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_near_duplicates(_docs_df(spark, texts)).collect()
    }
    assert got == _model_minhash_pairs(texts)


@settings(max_examples=5, deadline=None)
@given(docs_strategy)
def test_simhash_matches_model(spark, texts):
    got = {r["doc_id"]: r["simhash"] for r in simhash(_docs_df(spark, texts)).collect()}
    assert got == {i: _model_simhash(t) for i, t in enumerate(texts)}


# --- connected components / duplicate families -----------------------------

def _model_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find over the pair graph; label = min id per component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


edges_strategy = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(lambda p: p[0] != p[1]),
    min_size=0,
    max_size=20,
)


@settings(max_examples=8, deadline=None)
@given(edges_strategy)
def test_connected_components_match_union_find(spark, edges):
    from flink_clickstream_processor_msk_spark.operators.dedup import (
        connected_components,
    )

    df = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(0, 0)], "doc_a long, doc_b long"
    )
    if not edges:
        df = df.limit(0)
    got = {
        r["id"]: r["lbl"] for r in connected_components(df, "doc_a", "doc_b").collect()
    }
    assert got == _model_components(edges)
    spark.catalog.clearCache()


@settings(max_examples=6, deadline=None)
@given(edges_strategy)
def test_connected_components_branches_agree(spark, edges):
    """Driver-side union-find (small-graph branch) and distributed min-label
    propagation must produce identical labels either side of the cut-over."""
    from flink_clickstream_processor_msk_spark.operators.dedup import (
        connected_components,
    )

    df = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(0, 0)], "doc_a long, doc_b long"
    )
    if not edges:
        df = df.limit(0)
    small = {
        r["id"]: r["lbl"]
        for r in connected_components(
            df, "doc_a", "doc_b", small_graph_edge_rows=10**9
        ).collect()
    }
    distributed = {
        r["id"]: r["lbl"]
        for r in connected_components(
            df, "doc_a", "doc_b", small_graph_edge_rows=0
        ).collect()
    }
    assert small == distributed == _model_components(edges)
    spark.catalog.clearCache()


def test_bucket_cap_keeps_giant_family_subquadratic(spark):
    """A giant mutual-duplicate family (one LSH bucket) must emit
    O(cap²) candidate pairs under the production cap, not O(m²)."""
    from flink_clickstream_processor_msk_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    m, cap = 60, 8
    docs = _docs_df(spark, ["spark flink stream batch query engine" * 3] * m)
    sigs = minhash_signatures(docs)
    capped = lsh_candidate_pairs(sigs, max_bucket_size=cap).count()
    exact = lsh_candidate_pairs(sigs, max_bucket_size=None).count()
    assert exact == m * (m - 1) // 2  # identical docs: every pair collides
    assert capped == cap * (cap - 1) // 2
    spark.catalog.clearCache()


def test_duplicate_families_chain(spark):
    """A~B and B~C near-dups must land in ONE family labeled min(doc_id)."""
    from flink_clickstream_processor_msk_spark.operators.dedup import (
        minhash_duplicate_families,
    )

    base = "spark flink stream batch query engine scale data " * 4
    texts = [
        base + "alpha beta gamma delta",      # 0: near 1
        base + "alpha beta gamma epsilon",    # 1: near 0 and 2
        base + "alpha beta zeta epsilon",     # 2: near 1
        "totally different words entirely unrelated content here",  # 3: alone
    ]
    rows = minhash_duplicate_families(_docs_df(spark, texts)).collect()
    fam = {r["doc_id"]: (r["family_rep"], r["family_size"]) for r in rows}
    assert fam == {0: (0, 3), 1: (0, 3), 2: (0, 3)}
    spark.catalog.clearCache()


def test_graph_stats_distinguishes_clique_from_chain(spark):
    """dedup_graph_stats' audit semantics: in a CLIQUE (stamped
    boilerplate) every member's degree is family_size - 1; in a CHAIN of
    pairwise edits (near-dup drift) the interior has degree 2 and the
    endpoints 1, while family_size spans the whole chain — the signal
    that transitive dedup is merging documents that never directly
    matched."""
    from flink_clickstream_processor_msk_spark.operators.dedup import (
        dedup_graph_stats,
        minhash_near_duplicates,
    )

    base = "spark flink stream batch query engine scale data " * 4
    texts = [
        base + "alpha beta gamma delta",    # 0: chain end (pairs with 1)
        base + "alpha beta gamma epsilon",  # 1: chain middle (0 and 2)
        base + "alpha beta zeta epsilon",   # 2: chain end (pairs with 1)
        "totally different words entirely unrelated content here",  # 3
    ]
    from collections import Counter

    docs = _docs_df(spark, texts)
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_near_duplicates(docs).collect()
    }
    # the fixture is a 3-doc CHAIN (2 pairs over docs 0-2, doc 3 alone) —
    # which doc sits in the middle depends on which bands collide, so the
    # expected degrees derive from the actual pair set
    assert len(pairs) == 2 and {d for p in pairs for d in p} == {0, 1, 2}
    deg = Counter(d for p in pairs for d in p)
    assert sorted(deg.values()) == [1, 1, 2]  # chain, not a clique
    rows = dedup_graph_stats(docs).collect()
    got = {
        r["doc_id"]: (r["degree"], r["family_rep"], r["family_size"])
        for r in rows
    }
    assert got == {d: (deg[d], 0, 3) for d in (0, 1, 2)}
    spark.catalog.clearCache()


def test_connected_components_long_chain_logarithmic_rounds(spark):
    """The round-12 large-star/small-star rewrite's reason to exist: a
    transitive dup CHAIN of length L (what near-dup families produce) is
    the adversarial case for the replaced min-label propagation, which
    needed L rounds (diameter-bound — a 120-chain would have EXCEEDED the
    default max_iterations=50 and raised). The star alternation must (a)
    label the whole chain with its minimum, identically to the driver
    union-find path, and (b) converge in logarithmically few rounds."""
    from pyspark.sql import functions as F

    from flink_clickstream_processor_msk_spark.operators.dedup import (
        connected_components,
    )

    length = 120
    chain = spark.range(length).select(
        (F.col("id") + 1).alias("doc_a"), F.col("id").alias("doc_b")
    )
    stats: dict = {}
    dist = {
        r["id"]: r["lbl"]
        for r in connected_components(
            chain, "doc_a", "doc_b",
            small_graph_edge_rows=0, stats=stats,
        ).collect()
    }
    assert stats["path"] == "star"
    assert stats["rounds"] <= 10, stats  # log²-ish, nowhere near 121
    assert dist == {i: 0 for i in range(length + 1)}
    driver = {
        r["id"]: r["lbl"]
        for r in connected_components(chain, "doc_a", "doc_b").collect()
    }
    assert driver == dist
    spark.catalog.clearCache()


def test_family_pipeline_star_path_matches_union_find(spark):
    """VERDICT r12 next-round #6: the distributed star component path,
    forced end-to-end through minhash_duplicate_families AND clean_corpus
    (small_graph_edge_rows=0), must produce row-identical output to the
    default union-find fast path, and the cc_stats hook must show which
    path ran."""
    from flink_clickstream_processor_msk_spark.operators.dedup import (
        minhash_duplicate_families,
        minhash_near_duplicates,
    )
    from flink_clickstream_processor_msk_spark.operators.pipeline import (
        clean_corpus,
    )

    base = "spark flink stream batch query engine scale data " * 4
    suffix = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    # chain: doc i shares all but one suffix token with doc i+1
    texts = [
        base + " ".join(suffix[i : i + 4]) for i in range(len(suffix) - 3)
    ] + ["totally different words entirely unrelated content here five"]
    docs = _docs_df(spark, texts)
    pairs = minhash_near_duplicates(docs)
    pairs.persist().count()

    fam_default: dict = {}
    fam_star: dict = {}
    rows_default = sorted(
        map(tuple, minhash_duplicate_families(
            docs, pairs=pairs, cc_stats=fam_default
        ).collect())
    )
    rows_star = sorted(
        map(tuple, minhash_duplicate_families(
            docs, pairs=pairs, small_graph_edge_rows=0, cc_stats=fam_star
        ).collect())
    )
    assert fam_default == {"path": "driver", "rounds": 0}
    assert fam_star["path"] == "star" and fam_star["rounds"] >= 1
    assert rows_default == rows_star and rows_default  # non-empty parity

    cc_stats: dict = {}
    kept_star = sorted(
        r["doc_id"]
        for r in clean_corpus(
            docs, pairs=pairs, small_graph_edge_rows=0, cc_stats=cc_stats
        ).collect()
    )
    kept_default = sorted(
        r["doc_id"] for r in clean_corpus(docs, pairs=pairs).collect()
    )
    assert cc_stats["path"] == "star"
    assert kept_star == kept_default
    pairs.unpersist()
    spark.catalog.clearCache()
