"""Adjudicate VERDICT r14 wrong #1: the pairs-consumer block read 2.5-4x
baseline in the r14 driver bench window (clean_corpus 3.39 s vs 0.85,
dedup_graph_stats 2.22 vs 0.80, family_safe_split 1.85 vs 0.71) while the
builder (dedup_minhash_jaccard 1.149 vs 0.88/1.19) and the FOURTH pairs
consumer (dedup_families 0.568 vs 0.40/0.56, tail position) read normal.

Two candidate mechanisms:
  (a) EVICTION: the MEMORY_AND_DISK-persisted pairs table dropped under
      suite memory pressure so each consumer re-ran the md5 shingle
      pipeline (the 3-5x the _materialized docstring predicts);
  (b) WINDOW: a sustained host/JVM stall spanning the three ADJACENT
      in-window consumers (suite order: ...lm_bigram_score,
      dedup_ngram_jaccard, dedup_simhash, dedup_embedding_cosine,
      family_safe_split, clean_corpus, dedup_graph_stats,
      semantic_dedup...), recovered by the time the tail's
      dedup_families ran.

This harness discriminates them: it replays the bench loop shape
(warm_caches -> timed run -> clearCache) over the block, recording per
run the UNTIMED warm wall and the pairs artifact's cache residency
(cached-partition deficit + mem/disk bytes from getRDDStorageInfo)
immediately before the timed run. Under mechanism (a) the residency
shows missing partitions and the timed wall absorbs the rebuild; under
(b) residency is complete and warm+timed inflate together host-wide.

PRESSURE_GB (default 0) localCheckpoints ~that many GB of synthetic
rows first — block-manager residue that catalog.clearCache() does NOT
drop, the same species as the suite's accumulated localCheckpoint
blocks — to test eviction behavior deliberately. BLOCK_RUNS (default
5) runs per query. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BLOCK = [
    "lm_bigram_score",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "family_safe_split",
    "clean_corpus",
    "dedup_graph_stats",
    "semantic_dedup",
    "dedup_families",
]


def rdd_storage(spark) -> dict:
    """Aggregate block-manager residency: total cached mem/disk bytes and
    the cached-partition DEFICIT (partitions a persisted RDD declares
    minus partitions actually resident — >0 means something was evicted
    without disk backing or never materialized)."""
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    mem = disk = deficit = n = 0
    for info in infos:
        mem += info.memSize()
        disk += info.diskSize()
        deficit += info.numPartitions() - info.numCachedPartitions()
        n += 1
    return {"n_rdds": n, "mem_mb": round(mem / 2**20, 1),
            "disk_mb": round(disk / 2**20, 1), "part_deficit": deficit}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs_per = int(os.environ.get("BLOCK_RUNS", "5"))
    pressure_gb = float(os.environ.get("PRESSURE_GB", "0"))

    import __spark_entry__ as entry_mod
    from flink_clickstream_processor_msk_spark import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(app_name="measure_pairs_block")
    # bench.py's generic warmup (JIT, codegen, Arrow pool)
    spark.range(10_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    ncpu = spark.sparkContext.defaultParallelism
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    @pandas_udf("long", PandasUDFType.SCALAR)
    def _warm(s):
        return s

    spark.range(ncpu * 4, numPartitions=ncpu).select(_warm("id")).write.format(
        "noop"
    ).mode("overwrite").save()

    pressure_handle = None
    if pressure_gb > 0:
        # ~72 bytes/row cached (long + 8x md5-derived strings); outside
        # the CacheManager so the loop's clearCache leaves it resident,
        # exactly like the suite's accumulated localCheckpoint residue
        rows = int(pressure_gb * 2**30 / 72)
        pressure_handle = (
            spark.range(rows, numPartitions=ncpu * 4)
            .select(
                "id", *[
                    F.md5(F.concat(F.col("id").cast("string"), F.lit(str(i)))).alias(f"h{i}")
                    for i in range(8)
                ]
            )
            .localCheckpoint()
        )
        pressure_handle.count()

    queries = entry_mod.queries()
    out: dict[str, dict] = {}
    for name in BLOCK:
        fn = queries[name]
        deps = entry_mod.CACHE_DEPS.get(name, ())
        walls, warms, resid = [], [], []
        for _ in range(runs_per):
            w0 = time.perf_counter()
            entry_mod.warm_caches(spark, sf_dir, deps)
            warms.append(time.perf_counter() - w0)
            if deps:
                resid.append(rdd_storage(spark))
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        out[name] = {
            "min": round(min(walls), 3),
            "med": round(statistics.median(walls), 3),
            "max": round(max(walls), 3),
            "warm_min": round(min(warms), 3),
            "warm_max": round(max(warms), 3),
        }
        if resid:
            out[name]["resid_last"] = resid[-1]
            out[name]["max_part_deficit"] = max(r["part_deficit"] for r in resid)
    print(json.dumps({
        "metric": "pairs_block",
        "sf": sf_dir,
        "runs_per": runs_per,
        "pressure_gb": pressure_gb,
        "queries": out,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
