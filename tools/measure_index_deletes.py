"""Written-ANN-index delete-path cost at 1x and 10x — feeds PLANS.md
(the round-10 symmetry of tools/measure_tombstones.py: the dedup state's
delete numbers exist, the index lifecycle added in the same round should
carry its own).

Per factor (sf0.1 embeddings 2k vectors at 1x; x10 id-shifted at 10x),
for the IVF and PQ layouts: probe cost (load + ann top-k) with no
tombstones, tombstone write for a takedown-sized id list, probe with
tombstones pending (the broadcast anti-join leg), compaction (staged
table rewrite), probe after. Correctness asserts ride along (victims
vanish from top-k, physical row drop, tombstones cleared).

    python tools/measure_index_deletes.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = "/tmp/index_delete_measure"
ID_STRIDE = 10_000_000
TAKEDOWN = 200
K = 10


def main() -> None:
    from flink_clickstream_processor_msk_spark import get_spark
    from flink_clickstream_processor_msk_spark.operators import similarity as sim

    spark = get_spark(app_name="measure_index_deletes")
    spark.range(10_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )

    def corpus(factor: int):
        if factor == 1:
            return emb
        reps = [
            emb.select(
                (F.col("vec_id") + F.lit(i * ID_STRIDE)).alias("vec_id"),
                "embedding",
            )
            for i in range(factor)
        ]
        out = reps[0]
        for r in reps[1:]:
            out = out.unionByName(r)
        return out

    kinds = {
        "ivf": (sim.save_ivf_index, sim.load_ivf_index,
                lambda df, idx: sim.ann_ivf_topk(df, 3, K, index=idx)),
        "pq": (sim.save_pq_index, sim.load_pq_index,
               lambda df, idx: sim.ann_pq_topk(df, 3, K, index=idx)),
    }

    shutil.rmtree(SCRATCH, ignore_errors=True)
    for factor in (1, 10):
        vecs = corpus(factor)
        n = vecs.count()
        for kind, (save, load, probe) in kinds.items():
            path = f"{SCRATCH}/{kind}_{factor}x"
            save(vecs, path)

            def probe3(label):
                runs, ids = [], None
                for _ in range(3):
                    t0 = time.perf_counter()
                    rows = probe(vecs, load(spark, path)).collect()
                    runs.append(round(time.perf_counter() - t0, 3))
                    ids = {r["vec_id"] for r in rows}
                print(f"  {kind} {factor}x probe {label}: runs={runs} "
                      f"best={min(runs)}")
                return min(runs), ids

            base, top = probe3("no-tombstones")
            # takedown half the current top-k plus filler ids — NEVER the
            # query vector itself (id 3): the probe resolves the query
            # from the index, so deleting it is a different (refusing)
            # code path, not the one under measurement
            victims = sorted(top)[: max(1, K // 2)] + [
                int(r["vec_id"])
                for r in vecs.orderBy(F.desc("vec_id")).limit(TAKEDOWN).collect()
            ]
            victims = sorted(set(v for v in victims if v != 3))[:TAKEDOWN]
            t0 = time.perf_counter()
            sim.delete_from_index(spark, path, victims)
            write_cost = round(time.perf_counter() - t0, 3)
            print(f"  {kind} {factor}x tombstone write ({len(victims)} ids): "
                  f"{write_cost}s")

            pending, after_ids = probe3("pending-tombstones")
            assert not (after_ids & set(victims)), "victim leaked into top-k"

            t0 = time.perf_counter()
            sim.compact_index(spark, path, kind)
            compact_cost = round(time.perf_counter() - t0, 3)
            sub = sim._INDEX_TABLES[kind][0]
            remaining = spark.read.parquet(f"{path}/{sub}").count()
            assert remaining == n - len(victims), (remaining, n)
            assert sim.load_index_tombstones(spark, path) is None
            post, _ = probe3("post-compaction")
            print(f"SUMMARY {kind} {factor}x ({n} vecs): probe base={base}s "
                  f"pending={pending}s (+{pending - base:+.3f}s) post={post}s; "
                  f"write={write_cost}s compact={compact_cost}s; "
                  f"rows {n}->{remaining}")
        spark.catalog.clearCache()
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
