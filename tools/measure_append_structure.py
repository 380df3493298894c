"""Quantify the pre-resolved-structure saving on index appends (r16).

VERDICT r15 #6: every written-index append paid 2-3 fixed-overhead jobs,
one of which is the sidecar resolve (centroids/codebooks/n_planes
collect). `ba1b9c5` let amortizing callers pre-resolve it once
(`load_index_structure` + `append_to_index(structure=...)` — the
`index_ingest_sink` path); `tools/measure_index_50x.py` measures the
UN-amortized wrapper path. This harness isolates the difference with an
INTERLEAVED A/B (per-call resolve vs pre-resolved) so the host's
documented one-sided stall windows hit both arms alike.

Usage: python tools/measure_append_structure.py [factor] [kinds]
Reuses /tmp/index{factor}x_measure/embeddings.parquet when present
(the measure_index_50x scratch), else rebuilds it the same way.
Prints one JSON line per kind: median/mean append wall per arm.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 50
KINDS = sys.argv[2].split(",") if len(sys.argv) > 2 else ["ivf", "ivfpq"]
SCRATCH = f"/tmp/index{FACTOR}x_measure"
ID_STRIDE = 10_000_000
PER_APPEND = 100
ROUNDS = 4  # appends per arm, interleaved A,B,A,B,...


def main() -> None:
    from flink_clickstream_processor_msk_spark import get_spark
    from flink_clickstream_processor_msk_spark.operators import similarity

    spark = get_spark(app_name="measure_append_structure")
    spark.range(10_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    base_emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    emb_path = f"{SCRATCH}/embeddings.parquet"
    if not os.path.isdir(emb_path):
        reps = [
            base_emb.select(
                (F.col("vec_id") + F.lit(i * ID_STRIDE)).alias("vec_id"),
                "embedding",
            )
            for i in range(FACTOR)
        ]
        emb = reps[0]
        for r in reps[1:]:
            emb = emb.unionByName(r)
        emb.write.mode("overwrite").parquet(emb_path)
    emb = spark.read.parquet(emb_path)

    save = {
        "ivf": similarity.save_ivf_index,
        "lsh": similarity.save_lsh_index,
        "pq": similarity.save_pq_index,
        "ivfpq": similarity.save_ivfpq_index,
    }
    batch_src = (
        base_emb.orderBy("vec_id").limit(PER_APPEND * 2 * ROUNDS).collect()
    )

    for kind in KINDS:
        path = f"{SCRATCH}/idxab_{kind}"
        shutil.rmtree(path, ignore_errors=True)
        t0 = time.perf_counter()
        save[kind](emb, path)
        save_wall = time.perf_counter() - t0

        structure = similarity.load_index_structure(spark, path, kind)
        walls: dict[str, list[float]] = {"percall": [], "presolved": []}
        next_id = 900_000_000
        for rnd in range(ROUNDS * 2):
            arm = "percall" if rnd % 2 == 0 else "presolved"
            rows = batch_src[rnd * PER_APPEND : (rnd + 1) * PER_APPEND]
            batch = spark.createDataFrame(
                [(next_id + i, r["embedding"]) for i, r in enumerate(rows)],
                "vec_id bigint, embedding array<double>",
            )
            next_id += PER_APPEND
            t0 = time.perf_counter()
            similarity.append_to_index(
                batch,
                path,
                kind,
                structure=structure if arm == "presolved" else None,
            )
            walls[arm].append(time.perf_counter() - t0)
        print(
            json.dumps(
                {
                    "metric": "append_structure_ab",
                    "kind": kind,
                    "factor": FACTOR,
                    "save_wall_sec": round(save_wall, 1),
                    "percall_med_sec": round(
                        statistics.median(walls["percall"]), 3
                    ),
                    "presolved_med_sec": round(
                        statistics.median(walls["presolved"]), 3
                    ),
                    "percall_walls": [round(w, 3) for w in walls["percall"]],
                    "presolved_walls": [
                        round(w, 3) for w in walls["presolved"]
                    ],
                }
            ),
            flush=True,
        )
        shutil.rmtree(path, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
