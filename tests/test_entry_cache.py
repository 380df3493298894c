"""Session-level caches in __spark_entry__ must survive an external
``spark.catalog.clearCache()`` (the bench harness calls it between timing
runs) without silently degrading: the pairs plan nests a persisted
signature table whose mark clearCache strips, so the cache must rebuild
the plan fresh rather than re-mark only the outer frame.
"""

from __future__ import annotations

import __spark_entry__ as entry_mod
from conftest import SF_SMOKE


def test_minhash_pairs_cached_per_session(spark):
    p1 = entry_mod._minhash_pairs(spark, SF_SMOKE)
    assert entry_mod._minhash_pairs(spark, SF_SMOKE) is p1
    sl = p1.storageLevel
    assert sl.useMemory or sl.useDisk


def test_minhash_pairs_rebuilt_after_clear_cache(spark):
    p1 = entry_mod._minhash_pairs(spark, SF_SMOKE)
    rows1 = sorted(map(tuple, p1.collect()))
    spark.catalog.clearCache()
    p2 = entry_mod._minhash_pairs(spark, SF_SMOKE)
    # a fresh plan (not a re-mark of the stale one) with persist marks back
    assert p2 is not p1
    sl = p2.storageLevel
    assert sl.useMemory or sl.useDisk
    assert sorted(map(tuple, p2.collect())) == rows1


def test_cache_deps_declare_real_queries_and_builders(spark):
    q = entry_mod.queries()
    assert set(entry_mod.CACHE_DEPS).issubset(set(q))
    declared = {d for deps in entry_mod.CACHE_DEPS.values() for d in deps}
    assert declared.issubset(set(entry_mod._CACHE_BUILDERS))


def test_warm_caches_survives_clear_cache_cycle(spark):
    """bench.py's per-run cycle: clearCache → warm_caches(deps) must leave
    every declared artifact materialized and the query still correct."""
    spark.catalog.clearCache()
    entry_mod.warm_caches(spark, SF_SMOKE, ("pairs", "lsh"))
    pairs = entry_mod._minhash_pairs(spark, SF_SMOKE)
    sl = pairs.storageLevel
    assert sl.useMemory or sl.useDisk
    assert entry_mod.queries()["dedup_families"](spark, SF_SMOKE).count() > 0


def test_families_and_clean_corpus_share_pairs(spark):
    """The three pairs consumers must hand the SAME cached table to the
    operators (the whole point of the cache)."""
    q = entry_mod.queries()
    pairs = entry_mod._minhash_pairs(spark, SF_SMOKE)
    fam = q["dedup_families"](spark, SF_SMOKE)
    clean = q["clean_corpus"](spark, SF_SMOKE)
    assert entry_mod._minhash_pairs(spark, SF_SMOKE) is pairs
    assert fam.count() > 0
    assert clean.count() > 0
