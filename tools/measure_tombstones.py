"""Tombstone (delete) path cost at 1x and 10x — feeds PLANS.md
"Measured scaling" (VERDICT r9 next#4: the LSM delete rows had no
numbers).

Per corpus factor (sf0.1 documents ~5k docs at 1x, x10 per-replica
perturbed at 10x), against a takedown-sized id list (TAKEDOWN_IDS):

- tombstone WRITE cost (delete_from_dedup_state — O(ids) flat parquet)
- probe cost with NO tombstones pending (baseline: the claimed
  "zero cost when none pending" — one fs stat, no anti-join node)
- probe cost WITH tombstones pending (the nonzero case: broadcast
  anti-join applied to base ∪ delta at read)
- compaction cost WITHOUT tombstones vs WITH (the takedown flow adds the
  staged minhash_state rewrite + tombstone clear)
- probe after compaction (tombstones physically applied + cleared —
  should read as the no-tombstone baseline again)

Correctness asserts ride along: tombstoned ids emit no pairs, and the
compacted state is exactly (corpus - deleted).

    python tools/measure_tombstones.py            # factors 1, 10
    SCALE_FACTOR=10 python tools/measure_tombstones.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = "/tmp/tombstone_measure"
ID_STRIDE = 10_000_000
BATCH_SIZE = 100
TAKEDOWN_IDS = 1000
N_BUCKETS = 1024


def main() -> None:
    from flink_clickstream_processor_msk_spark import get_spark
    from flink_clickstream_processor_msk_spark.operators import dedup

    factors = (
        (int(os.environ["SCALE_FACTOR"]),)
        if "SCALE_FACTOR" in os.environ
        else (1, 10)
    )
    spark = get_spark(app_name="measure_tombstones")
    spark.range(10_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # fixed NOVEL probe batch (char-reversed text → disjoint shingles), as
    # in measure_incremental_probe.py: keeps pair output flat across
    # corpus sizes so the probe timing isolates the read-side term
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

    def probe_best_of_3(path, new_state, label):
        """Timed region = what an ingest epoch pays: banded-state read
        (incl. the tombstone stat/anti-join) + probe + pair count."""
        runs = []
        n = None
        for _ in range(3):
            scratch: list = []
            start = time.perf_counter()
            banded = dedup.load_banded_state(spark, path)
            ptmod = dedup.state_ptmod(spark, path)
            n = dedup.incremental_minhash_pairs(
                new_state, None,
                corpus_banded=banded, corpus_ptmod=ptmod, scratch=scratch,
            ).count()
            runs.append(round(time.perf_counter() - start, 3))
            for t in scratch:
                t.unpersist()
        print(f"  probe {label}: runs={runs} best={min(runs)} pairs={n}")
        return min(runs)

    shutil.rmtree(SCRATCH, ignore_errors=True)
    for factor in factors:
        path = f"{SCRATCH}/state_{factor}x"
        ndocs = docs.count() * factor
        t0 = time.perf_counter()
        dedup.save_dedup_state(corpus(factor), path, n_buckets=N_BUCKETS)
        print(f"state {factor}x ({ndocs} docs) saved in "
              f"{time.perf_counter() - t0:.1f}s")
        new_state = dedup.batch_dedup_state(batch)
        new_state.count()

        base = probe_best_of_3(path, new_state, f"{factor}x no-tombstones")

        # compaction cost WITHOUT tombstones (the scheduled maintenance)
        t0 = time.perf_counter()
        dedup.compact_dedup_state(spark, path, n_buckets=N_BUCKETS)
        compact_plain = round(time.perf_counter() - t0, 3)
        print(f"  compact {factor}x no-tombstones: {compact_plain}s")

        # takedown: TAKEDOWN_IDS real corpus members
        victims = [
            r["doc_id"]
            for r in dedup.load_dedup_state(spark, path)
            .select("doc_id").limit(TAKEDOWN_IDS).collect()
        ]
        t0 = time.perf_counter()
        dedup.delete_from_dedup_state(spark, path, victims)
        write_cost = round(time.perf_counter() - t0, 3)
        print(f"  tombstone write {factor}x ({len(victims)} ids): {write_cost}s")

        pending = probe_best_of_3(path, new_state, f"{factor}x pending-tombstones")

        # correctness ride-along: no pairs may touch a tombstoned id
        scratch: list = []
        pairs = dedup.incremental_minhash_pairs(
            new_state, None,
            corpus_banded=dedup.load_banded_state(spark, path),
            corpus_ptmod=dedup.state_ptmod(spark, path), scratch=scratch,
        )
        vdf = spark.createDataFrame([(int(v),) for v in victims], "doc_id long")
        leaked = (
            pairs.join(F.broadcast(vdf), pairs["doc_a"] == vdf["doc_id"], "left_semi").count()
            + pairs.join(F.broadcast(vdf), pairs["doc_b"] == vdf["doc_id"], "left_semi").count()
            if set(pairs.columns) >= {"doc_a", "doc_b"}
            else 0
        )
        for t in scratch:
            t.unpersist()

        t0 = time.perf_counter()
        dedup.compact_dedup_state(spark, path, n_buckets=N_BUCKETS)
        compact_tomb = round(time.perf_counter() - t0, 3)
        print(f"  compact {factor}x with-tombstones: {compact_tomb}s "
              f"(vs {compact_plain}s plain)")

        after = probe_best_of_3(path, new_state, f"{factor}x post-compaction")
        remaining = dedup.load_dedup_state(spark, path).count()
        assert remaining == ndocs - len(victims), (remaining, ndocs)
        assert leaked == 0, f"{leaked} pairs touched tombstoned ids"
        assert dedup.load_deleted_ids(spark, path) is None
        print(
            f"SUMMARY {factor}x: probe base={base}s pending={pending}s "
            f"(+{pending - base:+.3f}s) post-compact={after}s; "
            f"tombstone write={write_cost}s; compact plain={compact_plain}s "
            f"with-tombstones={compact_tomb}s; state {ndocs}->{remaining} rows"
        )
        new_state.unpersist()
        spark.catalog.clearCache()
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
