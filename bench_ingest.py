"""Streaming corpus-ingest throughput — the incremental dedup pipeline
end-to-end (BASELINE.md row; not part of the driver's bench.py contract).

Replays the sf-tier `documents` table file-at-a-time through
`streaming/ingest.dedup_ingest_sink`: per micro-batch, shingle+sign the
batch once (Arrow md5 kernel), probe the PRE-BANDED written state with
partition pruning, emit verified near-dup pairs, fold the batch into
both state tables. Wall time covers the WHOLE accumulation — batch k is
checked against the state of batches 1..k-1 — so the metric prices the
real ingest regime, not an empty-corpus fast path.

Prints one JSON line:
    {"metric": "ingest_docs_per_sec", "value": N, "unit": "docs/sec",
     "docs": n, "pairs": p, "batches": b, "wall_sec": s, "sf": dir}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_BATCHES = int(os.environ.get("BENCH_INGEST_BATCHES", "10"))
N_RUNS = int(os.environ.get("BENCH_INGEST_RUNS", "3"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from flink_clickstream_processor_msk_spark import get_spark
    from flink_clickstream_processor_msk_spark.streaming.ingest import (
        dedup_ingest_sink,
        init_dedup_state,
    )

    spark = get_spark(app_name="bench-ingest")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()

    # stage the corpus as N_BATCHES files (one micro-batch each) —
    # split by pmod(doc_id, N), NOT by id range: replicated tiers
    # (tools/scale10x.py) offset ids by 10M strides, and a range split
    # silently drops every replica but the first (a first cut did,
    # reporting a 10x throughput that had ingested 10% of the corpus)
    src = tempfile.mkdtemp(prefix="bench-ingest-src-")
    from pyspark.sql import functions as F

    for i in range(N_BATCHES):
        docs.filter(
            F.pmod(F.col("doc_id"), F.lit(N_BATCHES)) == i
        ).coalesce(1).write.mode("append").parquet(src)

    # warmup: one small untimed replay (codegen + Arrow worker pool)
    warm_state = tempfile.mkdtemp(prefix="bench-ingest-warm-")
    init_dedup_state(spark, warm_state)
    warm_src = tempfile.mkdtemp(prefix="bench-ingest-warmsrc-")
    docs.limit(200).coalesce(1).write.mode("overwrite").parquet(warm_src)
    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(warm_src)
        .writeStream.foreachBatch(
            dedup_ingest_sink(warm_state, lambda df, _e: df.count())
        )
        .option("checkpointLocation", tempfile.mkdtemp(prefix="bi-wckpt-"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    shutil.rmtree(warm_state, ignore_errors=True)
    shutil.rmtree(warm_src, ignore_errors=True)

    walls = []
    pairs_total = 0
    epoch_walls: list[float] = []
    for _ in range(N_RUNS):
        state = tempfile.mkdtemp(prefix="bench-ingest-state-")
        init_dedup_state(spark, state)
        counts = []
        # time each epoch too: batch k probes the state of batches
        # 1..k-1, so a FLAT per-epoch curve is the direct evidence the
        # probe cost is corpus-independent (the 100 TB claim), while a
        # rising curve would reveal a hidden corpus-proportional term
        epoch_walls = []
        inner = dedup_ingest_sink(state, lambda df, _e: counts.append(df.count()))

        def timed(df, e):
            t0 = time.perf_counter()
            inner(df, e)
            epoch_walls.append(round(time.perf_counter() - t0, 3))

        start = time.perf_counter()
        q = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(timed)
            .option("checkpointLocation", tempfile.mkdtemp(prefix="bi-ckpt-"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        walls.append(time.perf_counter() - start)
        pairs_total = sum(counts)
        shutil.rmtree(state, ignore_errors=True)
        spark.catalog.clearCache()
    shutil.rmtree(src, ignore_errors=True)

    walls.sort()
    med = walls[len(walls) // 2]
    print(
        json.dumps(
            {
                "metric": "ingest_docs_per_sec",
                "value": round(n_docs / med, 1),
                "unit": "docs/sec",
                "docs": n_docs,
                "pairs": pairs_total,
                "batches": N_BATCHES,
                "wall_sec": round(med, 3),
                "wall_spread": [round(w, 3) for w in walls],
                "epoch_walls_last_run": epoch_walls,
                "sf": sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
