"""Banded dedup-state lifecycle at ~50× (VERDICT r13 #4).

The r11/r13 file-count findings (probe cost ∝ delta FILES, row term
sub-noise; compact ≈ corpus rewrite) are measured only to a 10×/50 k-doc
base. This harness replicates the sf0.1 documents 50× (per-replica text
suffix — the scale10x near-dup convention, so banding carries real
families), then measures at the 250 k-doc base:

  - base save wall (the corpus-banded write),
  - append wall per 500-doc batch (the flat delta_files=1 path),
  - probe wall at delta depths 0/40/160 batches (novel probe batch —
    zero-pair, isolates the read term),
  - compact wall at depth 40 and 160,
  - the re-fit E* = sqrt(2·C / (f·files_per_epoch)) vs the committed
    recommended_compact_every constants.

Usage: python tools/measure_state_50x.py [factor]
Numbers land in PLANS.md by hand; idle-window caveat applies.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 50
SCRATCH = f"/tmp/state{FACTOR}x_measure"
ID_STRIDE = 10_000_000
BATCH_SIZE = 500
DEPTHS = [0, 40, 160]
COMPACT_AT = {40, 160}


def main() -> None:
    from flink_clickstream_processor_msk_spark import get_spark
    from flink_clickstream_processor_msk_spark.operators import dedup
    from flink_clickstream_processor_msk_spark.streaming.ingest import (
        _StateHandles,
        recommended_compact_every,
    )

    spark = get_spark(app_name="measure_state_50x")
    spark.range(10_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

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
    docs = reps[0]
    for r in reps[1:]:
        docs = docs.unionByName(r)
    shutil.rmtree(SCRATCH, ignore_errors=True)
    docs.write.mode("overwrite").parquet(f"{SCRATCH}/documents.parquet")
    docs = spark.read.parquet(f"{SCRATCH}/documents.parquet")
    n_docs = docs.count()

    path = f"{SCRATCH}/state"
    t0 = time.perf_counter()
    dedup.save_dedup_state(docs, path)
    save_wall = round(time.perf_counter() - t0, 1)
    print(json.dumps({"base_docs": n_docs, "save_wall_sec": save_wall}), flush=True)

    probe_docs = (
        base_docs.orderBy("doc_id")
        .limit(BATCH_SIZE)
        .select(
            (F.col("doc_id") + F.lit(999 * ID_STRIDE)).alias("doc_id"),
            F.concat(F.reverse(F.col("text")), F.lit(" probeonly")).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
    )
    probe_state = dedup.batch_dedup_state(probe_docs)
    probe_state.count()

    handles = _StateHandles(path)

    def probe_wall() -> float:
        best = float("inf")
        for _ in range(3):
            scratch: list = []
            t0 = time.perf_counter()
            dedup.incremental_minhash_pairs(
                probe_state,
                None,
                corpus_banded=handles.banded(spark),
                corpus_ptmod=handles.ptmod(spark),
                scratch=scratch,
            ).count()
            best = min(best, time.perf_counter() - t0)
            for df in scratch:
                df.unpersist()
        return round(best, 3)

    append_walls: list[float] = []
    compact_walls: dict[int, float] = {}
    depth = 0
    for target in DEPTHS:
        for e in range(depth + 1, target + 1):
            batch = (
                base_docs.orderBy("doc_id")
                .limit(BATCH_SIZE)
                .select(
                    (F.col("doc_id") + F.lit((100 + e) * ID_STRIDE)).alias("doc_id"),
                    F.concat(F.reverse(F.col("text")), F.lit(f" delta{e}")).alias(
                        "text"
                    ),
                    "lang",
                    "source",
                    "n_chars",
                )
            )
            new_state = dedup.batch_dedup_state(batch)
            t0 = time.perf_counter()
            dedup.append_dedup_state(
                new_state, path, resolved_ptmod=handles.ptmod(spark)
            )
            append_walls.append(round(time.perf_counter() - t0, 3))
            new_state.unpersist()
        depth = target
        print(
            json.dumps(
                {
                    "delta_batches": depth,
                    "delta_docs": depth * BATCH_SIZE,
                    "probe_wall_sec": probe_wall(),
                    "append_wall_last": append_walls[-1] if append_walls else None,
                }
            ),
            flush=True,
        )
        if depth in COMPACT_AT:
            copy = f"{SCRATCH}/compact_{depth}"
            shutil.copytree(path, copy)
            t0 = time.perf_counter()
            dedup.compact_dedup_state(spark, copy)
            compact_walls[depth] = round(time.perf_counter() - t0, 1)
            shutil.rmtree(copy, ignore_errors=True)
            print(
                json.dumps(
                    {"compact_at_batches": depth, "compact_wall_sec": compact_walls[depth]}
                ),
                flush=True,
            )

    mean_append = round(sum(append_walls) / max(1, len(append_walls)), 3)
    c = sum(compact_walls.values()) / max(1, len(compact_walls))
    # per-file probe term from the measured curve would need the pre-fix
    # multi-file regime to emerge; at delta_files=1 the committed
    # PROBE_SEC_PER_DELTA_FILE constant is the fit — report E* under the
    # 50x-measured C with that constant, vs the committed default
    f_per_file = 0.00106
    e_star = max(1, int(math.sqrt(2 * c / f_per_file)))
    print(
        json.dumps(
            {
                "mean_append_sec": mean_append,
                "compact_wall_mean_sec": round(c, 1),
                "e_star_50x": e_star,
                "recommended_default": recommended_compact_every(),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
