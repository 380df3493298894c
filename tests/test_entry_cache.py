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
