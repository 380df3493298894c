"""Written-index lifecycle at ~50× (VERDICT r14 next #4).

The r12 index-delta terms (probe cost ∝ delta files, compact ≈ table
rewrite) behind the sinks' ``compact_every`` default were measured only
at the sf0.1/10× tier, and only for IVF
(tools/measure_index_compaction.py). The dedup state got its 50×
confirmation in r14 (tools/measure_state_50x.py); this is the same
treatment for the FOUR written-index layouts: replicate the sf0.1
embeddings FACTOR× (vec_id stride — disjoint id populations, 50×
cell/bucket occupancy, the realistic growth mode), then per kind
(ivf / lsh / pq / ivfpq) measure

  - save wall (the corpus-partitioned base install),
  - append wall per 100-vector batch (the sinks' shape, flat delta),
  - probe wall at delta depths 0/16/64 appends (partition-pruned for
    ivf/ivfpq/lsh, full codes scan for pq — each kind's own read shape),
  - compact wall at depth 64 + post-compact probe,
  - the probe-per-delta-file slope and E* = sqrt(2·C / slope) vs the
    committed recommended_compact_every constants.

Usage: python tools/measure_index_50x.py [factor] [kinds-csv]
One JSON line per kind. Numbers land in PLANS.md by hand; idle-window
caveat applies (include a same-window control; never two Spark jobs
concurrently while timing).
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
KINDS = (sys.argv[2].split(",") if len(sys.argv) > 2
         else ["ivf", "lsh", "pq", "ivfpq"])
SCRATCH = f"/tmp/index{FACTOR}x_measure"
ID_STRIDE = 10_000_000
PER_APPEND = 100
DEPTHS = [
    int(x)
    for x in os.environ.get("INDEX50X_DEPTHS", "0,16,64").split(",")
]


def main() -> None:
    from flink_clickstream_processor_msk_spark import get_spark
    from flink_clickstream_processor_msk_spark.operators import similarity

    spark = get_spark(app_name="measure_index_50x")
    spark.range(10_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    base_emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    shutil.rmtree(SCRATCH, ignore_errors=True)
    reps = [
        base_emb.select(
            (F.col("vec_id") + F.lit(i * ID_STRIDE)).alias("vec_id"), "embedding"
        )
        for i in range(FACTOR)
    ]
    emb = reps[0]
    for r in reps[1:]:
        emb = emb.unionByName(r)
    emb.write.mode("overwrite").parquet(f"{SCRATCH}/embeddings.parquet")
    emb = spark.read.parquet(f"{SCRATCH}/embeddings.parquet")
    n_vecs = emb.count()
    print(json.dumps({"factor": FACTOR, "n_vecs": n_vecs}), flush=True)

    save = {
        "ivf": similarity.save_ivf_index,
        "lsh": similarity.save_lsh_index,
        "pq": similarity.save_pq_index,
        "ivfpq": similarity.save_ivfpq_index,
    }
    append = {
        "ivf": similarity.append_to_ivf_index,
        "lsh": similarity.append_to_lsh_index,
        "pq": similarity.append_to_pq_index,
        "ivfpq": similarity.append_to_ivfpq_index,
    }
    sub_part = {
        "ivf": ("cells", "cell"),
        "ivfpq": ("cells", "cell"),
        "lsh": ("buckets", "bucket"),
        "pq": ("codes", None),
    }

    # append batches: fresh ids far from any replica stride
    batch_src = base_emb.orderBy("vec_id").limit(PER_APPEND * DEPTHS[-1]).collect()

    for kind in KINDS:
        path = f"{SCRATCH}/idx_{kind}"
        sub, part_col = sub_part[kind]
        t0 = time.perf_counter()
        save[kind](emb, path)
        save_wall = round(time.perf_counter() - t0, 1)

        if part_col:
            # each kind's own routing values, resolved from the live base
            # via the lsm resolver — since r16 the live {sub}/ is a
            # GENERATION directory (data/ + sidecars), not a bare table
            probe_vals = [
                r[part_col]
                for r in similarity._read_index_table(spark, path, sub)
                .select(part_col).distinct().orderBy(part_col).limit(4).collect()
            ]

        def probe_wall() -> float:
            walls = []
            for _ in range(3):
                t0 = time.perf_counter()
                q = similarity._apply_index_tombstones(
                    spark, path, similarity._read_index_table(spark, path, sub)
                )
                if part_col:
                    q = q.filter(F.col(part_col).isin(probe_vals))
                q.write.format("noop").mode("overwrite").save()
                walls.append(time.perf_counter() - t0)
            walls.sort()
            return round(walls[1], 3)

        probe_wall()  # discard: the first run of this plan shape pays
        # codegen/JIT warm-up (the 2x smoke read a NEGATIVE probe-vs-files
        # slope because the depth-0 sample carried it)

        append_walls: list[float] = []
        samples = []
        depth = 0
        for target in DEPTHS:
            for e in range(depth, target):
                rows = [
                    (int(r["vec_id"]) + (900 + e) * ID_STRIDE, r["embedding"])
                    for r in batch_src[e * PER_APPEND:(e + 1) * PER_APPEND]
                ]
                batch = spark.createDataFrame(
                    rows, "vec_id long, embedding array<float>"
                )
                t0 = time.perf_counter()
                append[kind](batch, path)
                append_walls.append(round(time.perf_counter() - t0, 3))
            depth = target
            delta_dir = f"{path}/{sub}/delta"
            files = (
                len([f for f in os.listdir(delta_dir) if f.endswith(".parquet")])
                if os.path.isdir(delta_dir)
                else 0
            )
            samples.append({"delta_files": files, "probe_sec": probe_wall()})

        t0 = time.perf_counter()
        similarity.compact_index(spark, path, kind)
        compact_wall = round(time.perf_counter() - t0, 1)
        post = probe_wall()
        xs = [s["delta_files"] for s in samples]
        ys = [s["probe_sec"] for s in samples]
        mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
        denom = sum((x - mx) ** 2 for x in xs) or 1.0
        slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom
        print(
            json.dumps(
                {
                    "metric": "index_lifecycle_50x",
                    "kind": kind,
                    "factor": FACTOR,
                    "save_wall_sec": save_wall,
                    "append_med_sec": sorted(append_walls)[len(append_walls) // 2],
                    "samples": samples,
                    "probe_sec_per_delta_file": round(slope, 5),
                    "compact_wall_sec": compact_wall,
                    "probe_after_compact_sec": post,
                    "recommended_E": round(
                        (2 * compact_wall / max(slope, 1e-6)) ** 0.5
                    ),
                }
            ),
            flush=True,
        )
        shutil.rmtree(path, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
