"""Exercise the distributed star connected-components path END-TO-END in
the family pipeline at 10× (VERDICT r12 next-round #6).

`minhash_duplicate_families` is size-adaptive: below
SMALL_GRAPH_EDGE_ROWS (200 k directed edges) it solves families with
driver union-find, above it with the alternating large-star/small-star
contraction. The sf fixtures route through the fast path, so until r13
the star path had only been exercised on synthetic EDGE lists
(tools/measure_cc_rounds.py), never through the real pairs → families →
clean_corpus composition. The 10× replica tier produces ~249 k real
near-dup pairs (≈498 k directed edges), so at 10× the star path is the
DEFAULT — this harness confirms it fires naturally, asserts its output
is row-identical to the forced union-find leg, reports the stats hook's
round count, and times both legs plus the clean_corpus composition.

Usage: python tools/measure_family_star_path.py
Prints one JSON line per leg; numbers go into PLANS.md by hand. Run in
an idle window (host-throttling caveat).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from flink_clickstream_processor_msk_spark.operators import dedup, pipeline  # noqa: E402

TEN_X = os.environ.get("SCALE_OUT_DIR", "/tmp/scale10x")


def main() -> None:
    docs_path = f"{TEN_X}/documents.parquet"
    if not os.path.exists(docs_path):
        raise SystemExit(f"{docs_path} missing - run tools/scale10x.py first")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("measure_family_star_path")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "32g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(docs_path)

    pairs = dedup.minhash_near_duplicates(docs)
    pairs.persist()
    t0 = time.time()
    n_pairs = pairs.count()
    print(
        json.dumps(
            {"leg": "pairs", "n_pairs": n_pairs, "wall_sec": round(time.time() - t0, 1)}
        ),
        flush=True,
    )

    legs = {}
    for leg, kwargs in (
        ("star_default", {}),  # 2*n_pairs > 200k ⇒ star fires on its own
        ("union_find_forced", {"small_graph_edge_rows": 1 << 40}),
    ):
        stats: dict = {}
        t0 = time.time()
        fam = dedup.minhash_duplicate_families(
            docs, pairs=pairs, cc_stats=stats, **kwargs
        )
        fam.persist()
        n = fam.count()
        wall = time.time() - t0
        legs[leg] = fam
        print(
            json.dumps(
                {
                    "leg": leg,
                    "path": stats.get("path"),
                    "rounds": stats.get("rounds"),
                    "n_family_rows": n,
                    "wall_sec": round(wall, 1),
                }
            ),
            flush=True,
        )
    diff = (
        legs["star_default"].exceptAll(legs["union_find_forced"]).count()
        + legs["union_find_forced"].exceptAll(legs["star_default"]).count()
    )
    print(json.dumps({"leg": "family_parity", "except_all_diff": diff}), flush=True)
    assert diff == 0, "star families != union-find families"
    for fam in legs.values():
        fam.unpersist()

    cc_stats: dict = {}
    t0 = time.time()
    kept_star = pipeline.clean_corpus(docs, pairs=pairs, cc_stats=cc_stats)
    kept_star.persist()
    n_star = kept_star.count()
    wall_star = time.time() - t0
    t0 = time.time()
    kept_uf = pipeline.clean_corpus(
        docs, pairs=pairs, small_graph_edge_rows=1 << 40
    )
    kept_uf.persist()
    n_uf = kept_uf.count()
    wall_uf = time.time() - t0
    diff = (
        kept_star.exceptAll(kept_uf).count()
        + kept_uf.exceptAll(kept_star).count()
    )
    print(
        json.dumps(
            {
                "leg": "clean_corpus",
                "path": cc_stats.get("path"),
                "rounds": cc_stats.get("rounds"),
                "n_kept_star": n_star,
                "n_kept_union_find": n_uf,
                "except_all_diff": diff,
                "wall_star_sec": round(wall_star, 1),
                "wall_union_find_sec": round(wall_uf, 1),
            }
        ),
        flush=True,
    )
    assert diff == 0 and n_star == n_uf

    # long-chain leg: near-dup DRIFT (a~b, b~c, ... — the diameter
    # adversary measure_cc_rounds isolates) fed through the SAME pipeline
    # as a supplied pairs table over the 10× documents. 2×1200 edges is
    # below the small-graph threshold, so the star path is FORCED here —
    # the point is its round count on a 1200-diameter component inside
    # minhash_duplicate_families, not the routing.
    from pyspark.sql import functions as F

    chain_len = int(os.environ.get("CHAIN_LEN", "1200"))
    chain = spark.range(chain_len).select(
        (F.col("id") + 1).alias("doc_a"), F.col("id").alias("doc_b")
    )
    stats: dict = {}
    t0 = time.time()
    fam_star = dedup.minhash_duplicate_families(
        docs, pairs=chain, small_graph_edge_rows=0, cc_stats=stats
    )
    fam_star.persist().count()
    wall = time.time() - t0
    fam_uf = dedup.minhash_duplicate_families(docs, pairs=chain)
    fam_uf.persist().count()
    diff = (
        fam_star.exceptAll(fam_uf).count() + fam_uf.exceptAll(fam_star).count()
    )
    one_family = fam_star.agg(
        F.countDistinct("family_rep").alias("reps"),
        F.max("family_size").alias("size"),
    ).first()
    print(
        json.dumps(
            {
                "leg": "chain_1200_families",
                "path": stats.get("path"),
                "rounds": stats.get("rounds"),
                "except_all_diff": diff,
                "n_reps": one_family["reps"],
                "family_size": one_family["size"],
                "wall_sec": round(wall, 1),
            }
        ),
        flush=True,
    )
    assert diff == 0 and stats["path"] == "star"
    assert one_family["reps"] == 1 and one_family["size"] == chain_len + 1
    spark.stop()


if __name__ == "__main__":
    main()
