"""Corpus-size scaling of the incremental dedup band step — feeds
PLANS.md "Incremental ingest dedup".

The round-7 caveat: the legacy incremental path re-bands corpus ∪ new per
batch, an O(corpus) explode. The round-8 probe path reads the PRE-banded
state table with (band_idx, pt) partition pruning, so per-batch cost
should be flat as the corpus grows. This harness measures exactly that:
a FIXED 100-doc micro-batch checked against 5 k / 50 k / 250 k corpora (sf0.1 documents ×10, per-replica text perturbation as in
scale10x.py), legacy vs probe, best-of-3 each.

    python tools/measure_incremental_probe.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = "/tmp/incr_probe_measure"
ID_STRIDE = 10_000_000
BATCH_SIZE = 100


def main() -> None:
    from flink_clickstream_processor_msk_spark import get_spark
    from flink_clickstream_processor_msk_spark.operators import dedup

    spark = get_spark(app_name="measure_incremental_probe")
    spark.range(10_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # fixed probe batch: 100 docs of NOVEL content (char-reversed text →
    # disjoint shingle sets), identical for every corpus size. Novelty
    # matters: a batch near-dupping the corpus would emit 10× the pairs
    # against the 10× corpus (duplicate families replicate with it), and
    # the measurement would conflate legitimate output-bound growth with
    # the band-side term under test (first run of this harness did).
    batch = (
        docs.orderBy("doc_id")
        .limit(BATCH_SIZE)
        .select(
            (F.col("doc_id") + F.lit(100 * ID_STRIDE)).alias("doc_id"),
            F.reverse(F.col("text")).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
    )

    def corpus(factor: int):
        if factor == 1:
            return docs
        reps = [
            docs.select(
                (F.col("doc_id") + F.lit(i * ID_STRIDE)).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" r{i}")).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
            for i in range(factor)
        ]
        out = reps[0]
        for r in reps[1:]:
            out = out.unionByName(r)
        return out

    shutil.rmtree(SCRATCH, ignore_errors=True)
    results: dict[str, dict[str, float]] = {}
    for factor in (1, 10, 50):
        path = f"{SCRATCH}/state_{factor}x"
        t0 = time.perf_counter()
        # n_buckets sized for the corpus/batch ratio (the knob's contract:
        # a batch of m docs touches ≈ m partitions per band, so read
        # fraction ≈ m / n_buckets)
        dedup.save_dedup_state(corpus(factor), path, n_buckets=1024)
        print(f"state {factor}x saved in {time.perf_counter() - t0:.1f}s")
        new_state = dedup.batch_dedup_state(batch)
        new_state.count()  # materialize: batch signing is paid either way
        corpus_state = dedup.load_dedup_state(spark, path)
        banded = dedup.load_banded_state(spark, path)
        for mode, kwargs in (
            ("legacy", {}),
            ("probe", {"corpus_banded": banded}),
        ):
            runs = []
            for _ in range(3):
                start = time.perf_counter()
                n = dedup.incremental_minhash_pairs(
                    new_state, corpus_state, **kwargs
                ).count()
                runs.append(round(time.perf_counter() - start, 3))
            results.setdefault(mode, {})[f"{factor}x"] = min(runs)
            print(
                f"corpus {factor}x ({factor * 5}k docs) {mode}: runs={runs} "
                f"best={min(runs)} pairs={n}"
            )
        # scale-faithful evidence alongside wall time (local runs are
        # fixed-cost dominated): banded rows the probe's partition
        # pruning actually reads vs the full table the legacy path
        # re-bands + scans
        nb = dedup._banded(
            new_state.select("doc_id", "signature"),
            dedup.N_BANDS, dedup.N_PERMS, None,
        )
        touched = nb.select(
            "band_idx", dedup._state_bucket(F.col("band_key"), 1024).alias("pt")
        ).distinct()
        pruned_rows = banded.join(touched, ["band_idx", "pt"], "left_semi").count()
        total_rows = banded.count()
        print(
            f"corpus {factor}x banded rows: total={total_rows} "
            f"probe reads={pruned_rows} ({100 * pruned_rows / total_rows:.1f}%)"
        )
        new_state.unpersist()
        spark.catalog.clearCache()

    for mode, r in results.items():
        print(
            f"{mode}: 5k={r['1x']}s 50k={r['10x']}s 250k={r['50x']}s "
            f"growth 5k->250k={r['50x'] / r['1x']:.2f}x"
        )
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
