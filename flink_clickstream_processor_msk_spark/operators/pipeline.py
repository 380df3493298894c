"""End-to-end corpus cleaning — the composition a training-data pipeline
actually runs over a raw crawl: quality filter → exact dedup keep-one →
near-dup family keep-one.

Each stage is an already-oracle-checked operator; this module only wires
them, so the composed result is oracle-checkable too (oracles_beyond.
clean_corpus mirrors the same three-way set algebra).

Scale shape at 100 TB:

- quality_filter is a zero-shuffle per-row map (runs in the scan stage);
  applying it FIRST shrinks everything downstream.
- the exact-keeper join shuffles only (doc_id) pairs on doc_id;
- the near-dup "dropped" set (non-representative family members) is NOT
  assumed small — real web corpora run 30-50% near-dup, so at 100 TB it is
  terabytes and must never be force-broadcast. The anti-join is left to
  Catalyst/AQE: at small scale statistics make it a broadcast join anyway
  (asserted in tests/test_beyond.py), at 100 TB it becomes a shuffled join
  on doc_id — bounded and correct either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_clickstream_processor_msk_spark.operators.dedup import (
    exact_duplicates,
    minhash_duplicate_families,
)
from flink_clickstream_processor_msk_spark.operators.text import quality_filter


def clean_corpus(
    documents: DataFrame,
    min_quality: float = 0.5,
    min_tokens: int = 10,
    max_bucket_size: int | None = None,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """doc_ids that survive the full cleaning pipeline: pass the quality
    thresholds AND are their exact-content group's representative (min
    doc_id) AND are not a non-representative member of a near-dup family.

    ``max_bucket_size=None`` keeps the near-dup stage exact (the
    oracle-checked configuration); pass the production cap at scale.
    ``pairs`` forwards a prebuilt near-dup pair table to the family stage
    (see ``minhash_duplicate_families``) so the LSH pipeline isn't rebuilt.
    """
    quality = quality_filter(documents, min_quality, min_tokens).select("doc_id")
    exact_keepers = exact_duplicates(documents).select("doc_id")
    dropped = (
        minhash_duplicate_families(
            documents, max_bucket_size=max_bucket_size, pairs=pairs
        )
        .filter(F.col("doc_id") != F.col("family_rep"))
        .select("doc_id")
    )
    return (
        quality.join(exact_keepers, "doc_id")
        .join(dropped, "doc_id", "left_anti")
        .select("doc_id")
    )
