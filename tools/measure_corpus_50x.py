"""Composed corpus ingest at ~50× (VERDICT r14 next #5).

The multi-leg sink (`corpus_ingest_sink`: LM quality gate → SemDeDup
against a written IVF index → minhash near-dup probe + state fold, one
text pass + one embedding pass per batch) is measured to 10×/91 docs/s;
the standalone legs amortize, but the COMPOSED path's memory profile
(LM broadcast + IVF handles + minhash state simultaneously live) is
unproven past 10×. This harness:

  1. replicates documents + embeddings FACTOR× (the scale10x
     convention: per-replica id strides + text perturbation — real
     50-way families; only the two tables this leg reads, not the whole
     warehouse; `BENCH_INGEST_ID_MOD`-style pmod split keeps per-batch
     near-dup structure at the 1× shape),
  2. runs the composed sink over the stream slice in contiguous-id
     batches, recording the epoch-wall curve AND per-epoch JVM used
     heap (the memory-ceiling observable),
  3. identical-output checks:
       a. the two STATELESS gates recomputed in batch over the whole
          stream — expected rejected count (LM gate incl. the
          unscoreable class) and expected contaminated count must equal
          the sink's totals exactly;
       b. a full same-slices REPLAY into fresh states — every leg total
          must reproduce (the stateful legs' determinism check; the
          composed==manual-composition semantics are pinned at test
          scale in tests/test_incremental.py).

Usage: python tools/measure_corpus_50x.py [factor] [n_batches]
Prints one JSON line. Idle-window caveat applies.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 50
N_BATCHES = int(sys.argv[2]) if len(sys.argv) > 2 else 10
ID_STRIDE = 10_000_000
TIER = f"/tmp/scale{FACTOR}x_corpus"
SCRATCH = f"/tmp/corpus{FACTOR}x_measure"


def used_heap_mb(spark) -> int:
    rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
    return int((rt.totalMemory() - rt.freeMemory()) / 2**20)


def main() -> None:
    from flink_clickstream_processor_msk_spark import get_spark
    from flink_clickstream_processor_msk_spark.operators import (
        pipeline,
        similarity,
        text,
    )
    from flink_clickstream_processor_msk_spark.streaming.ingest import (
        corpus_ingest_sink,
        init_dedup_state,
    )
    spark = get_spark(app_name="measure_corpus_50x")
    spark.range(10_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    if not os.path.exists(f"{TIER}/_DONE"):
        shutil.rmtree(TIER, ignore_errors=True)
        base_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        reps = [
            base_docs.select(
                (F.col("doc_id") + F.lit(i * ID_STRIDE)).alias("doc_id"),
                (
                    F.col("text")
                    if i == 0
                    else F.concat(F.col("text"), F.lit(f" replica{i}"))
                ).alias("text"),
                *[c for c in base_docs.columns if c not in ("doc_id", "text")],
            )
            for i in range(FACTOR)
        ]
        d = reps[0]
        for r in reps[1:]:
            d = d.unionByName(r)
        d.write.mode("overwrite").parquet(f"{TIER}/documents.parquet")
        base_emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        ereps = [
            base_emb.select(
                (F.col("vec_id") + F.lit(i * ID_STRIDE)).alias("vec_id"),
                *[c for c in base_emb.columns if c != "vec_id"],
            )
            for i in range(FACTOR)
        ]
        em = ereps[0]
        for r in ereps[1:]:
            em = em.unionByName(r)
        em.write.mode("overwrite").parquet(f"{TIER}/embeddings.parquet")
        open(f"{TIER}/_DONE", "w").close()

    docs = spark.read.parquet(f"{TIER}/documents.parquet")
    emb = spark.read.parquet(f"{TIER}/embeddings.parquet").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    joined = docs.join(emb, "doc_id")
    # pmod split WITHIN each replica (the r12 BENCH_INGEST_ID_MOD lesson):
    # bootstrap = each replica's lower half, stream = its [1000, 2000)
    # slice — per-batch near-dup structure matches the 1x run instead of
    # streaming whole replicas of near-dups
    key = F.pmod(F.col("doc_id"), F.lit(ID_STRIDE))
    lo, hi = 1000, 2000
    stream = joined.filter((key >= lo) & (key < hi))
    n_stream = stream.count()
    ids = [r["doc_id"] for r in stream.select("doc_id").orderBy("doc_id").collect()]
    per = -(-len(ids) // N_BATCHES)

    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(SCRATCH)
    index_boot = spark.read.parquet(f"{TIER}/embeddings.parquet").filter(
        F.pmod(F.col("vec_id"), F.lit(ID_STRIDE)) < lo
    )
    lm_boot = docs.filter(F.pmod(F.col("doc_id"), F.lit(ID_STRIDE)) < 500)
    gram_boot = docs.filter(F.pmod(F.col("doc_id"), F.lit(ID_STRIDE)) < 20)

    t0 = time.perf_counter()
    lm_path = f"{SCRATCH}/lm"
    text.save_lm(lm_boot, lm_path)
    cut = text.lm_bigram_score(
        stream, lm=text.load_lm(spark, lm_path)
    ).approxQuantile("avg_prob", [0.1], 0.0)[0]
    grams_path = f"{SCRATCH}/grams"
    pipeline.save_test_grams(gram_boot, grams_path)
    boot_shared_wall = round(time.perf_counter() - t0, 1)

    # the stateless gates' EXPECTED totals, recomputed in batch over the
    # whole stream (identical-output check (a))
    scored = text.lm_bigram_score(stream, lm=text.load_lm(spark, lm_path))
    expected_rejected = scored.filter(
        F.col("avg_prob").isNull() | (F.col("avg_prob") < cut)
    ).count()
    admitted_docs = stream.join(
        scored.filter(F.col("avg_prob") >= cut).select("doc_id"), "doc_id"
    )
    expected_contaminated = (
        pipeline.decontaminate_incremental(
            admitted_docs, pipeline.load_test_grams(spark, grams_path)
        ).filter("contaminated = 1").count()
    )

    def one_run(tag: str) -> dict:
        root = f"{SCRATCH}/{tag}"
        os.makedirs(root, exist_ok=True)
        t0 = time.perf_counter()
        index_path = f"{root}/ivf"
        similarity.save_ivf_index(index_boot, index_path)
        state_path = f"{root}/state"
        init_dedup_state(spark, state_path)
        boot_wall = round(time.perf_counter() - t0, 1)

        pairs, flags, contaminated, rejected, sem_dropped = [0], [0], [0], [0], [0]
        inner = corpus_ingest_sink(
            state_path,
            grams_path,
            on_pairs=lambda df, e: pairs.__setitem__(0, pairs[0] + df.count()),
            on_flags=lambda df, e: (
                flags.__setitem__(0, flags[0] + df.count()),
                contaminated.__setitem__(
                    0, contaminated[0] + df.filter("contaminated = 1").count()
                ),
            ),
            lm_path=lm_path,
            min_avg_prob=cut,
            on_rejected=lambda df, e: rejected.__setitem__(
                0, rejected[0] + df.count()
            ),
            semantic_index_path=index_path,
            on_semantic_flags=lambda df, e: sem_dropped.__setitem__(
                0, sem_dropped[0] + df.filter("NOT is_kept").count()
            ),
        )
        epoch_walls, heap_mb = [], []
        start = time.perf_counter()
        for i in range(N_BATCHES):
            chunk = ids[i * per : (i + 1) * per]
            if not chunk:
                break
            batch = stream.filter(
                (F.col("doc_id") >= chunk[0]) & (F.col("doc_id") <= chunk[-1])
            )
            t1 = time.perf_counter()
            inner(batch, i)
            epoch_walls.append(round(time.perf_counter() - t1, 3))
            heap_mb.append(used_heap_mb(spark))
        wall = time.perf_counter() - start
        return {
            "boot_wall_sec": boot_wall,
            "docs_per_sec": round(n_stream / wall, 1),
            "wall_sec": round(wall, 1),
            "epoch_walls": epoch_walls,
            "heap_mb": heap_mb,
            "pairs": pairs[0],
            "flags": flags[0],
            "contaminated": contaminated[0],
            "rejected": rejected[0],
            "sem_dropped": sem_dropped[0],
        }

    run1 = one_run("run1")
    run2 = one_run("run2")  # the stateful-leg determinism replay (check b)
    legs = ("pairs", "flags", "contaminated", "rejected", "sem_dropped")
    print(
        json.dumps(
            {
                "metric": "corpus_semantic_ingest_50x",
                "factor": FACTOR,
                "stream_docs": n_stream,
                "batches": len(run1["epoch_walls"]),
                "boot_shared_wall_sec": boot_shared_wall,
                "run1": run1,
                "run2_docs_per_sec": run2["docs_per_sec"],
                "replay_identical": all(run1[k] == run2[k] for k in legs),
                "expected_rejected": expected_rejected,
                "rejected_match": run1["rejected"] == expected_rejected,
                "expected_contaminated": expected_contaminated,
                "contaminated_match": run1["contaminated"]
                == expected_contaminated,
                "sf": SF_DIR,
            }
        ),
        flush=True,
    )
    shutil.rmtree(SCRATCH, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
