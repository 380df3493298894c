"""Measure the batched BPE trainer's round-count/wall win (VERDICT r12
next-round #1): the r12 distributed trainer ran ONE Spark round per
merge, so a production 32k-100k-merge tokenizer would be bounded by
sequential job count, not data. r13 batches each round's merges via the
commuting prefix of the top pair-count rows
(operators/text._bpe_commuting_prefix — order-preservation proof in its
docstring). Realized batch size is a property of the CORPUS'S symbol
diversity: the top pairs of a tiny-vocabulary corpus constantly share
symbols (the batch must stop at the first interacting pair to stay
exact), so two legs are measured:

- ``testdata``: the 10x documents tier (build with tools/scale10x.py
  first). Its ~40-word vocabulary is the ADVERSARIAL regime — BPE
  exhausts at ~100 merges and batches rarely exceed 1 — reported
  honestly as the lower bound.
- ``rich``: a constructed 26k-word syllable/Zipf corpus (seeded,
  deterministic — the measure_cc_rounds chain-graph precedent: a
  measurement fixture, not driver test data) matching the vocabulary
  richness a real tokenizer trains on, where the commuting prefix
  averages ~3 merges/round at n_merges=512 and grows with depth as
  symbols lengthen and diversify.

Usage:
    python tools/measure_bpe_rounds.py [n_merges] [merge_batch] [leg...]

Prints one JSON line per (leg, merge_batch); numbers go into PLANS.md by
hand. Host-throttling caveat applies — run in an idle window, never
concurrently with other Spark jobs.
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from flink_clickstream_processor_msk_spark.operators import text

N_MERGES = int(sys.argv[1]) if len(sys.argv) > 1 else 512
MERGE_BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 64
LEGS = sys.argv[3:] or ["rich", "testdata"]
FACTOR = int(os.environ.get("SCALE_FACTOR", "10"))
TEN_X = os.environ.get("SCALE_OUT_DIR", f"/tmp/scale{FACTOR}x")


def rich_corpus(spark):
    """26k distinct syllable-words under a Zipf law — one document per
    word, the word repeated freq times (train_bpe_merges' phase 1
    re-derives the (word, freq) table from it)."""
    rng = random.Random(7)
    syl = [
        "ing", "er", "tion", "al", "re", "con", "de", "st", "ly",
        "ment", "pro", "ter", "an", "in", "en", "es", "ar", "or",
        "un", "ab",
    ]
    words = sorted(
        {
            "".join(rng.choice(syl) for _ in range(rng.randint(2, 4)))
            for _ in range(60000)
        }
    )[:50000]
    # Zipf at the 1e5 scale: large counts keep the top-of-table ranking
    # tie-free, which is what lets the commuting prefix run long — a
    # small-count corpus ties constantly and stops batches early (the
    # realized batch is a corpus property; both regimes are reported)
    rows = [
        (i, " ".join([w] * max(1, int(100000 / (i + 1) ** 0.9))))
        for i, w in enumerate(words)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("measure_bpe_rounds")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    for leg in LEGS:
        if leg == "testdata":
            docs_path = f"{TEN_X}/documents.parquet"
            if not os.path.exists(docs_path):
                raise SystemExit(
                    f"{docs_path} missing - run tools/scale10x.py first"
                )
            docs = spark.read.parquet(docs_path)
        else:
            docs = rich_corpus(spark)
        results = []
        for mb in (MERGE_BATCH, 1):
            stats: dict = {}
            t0 = time.time()
            merges = text.train_bpe_merges(
                docs,
                N_MERGES,
                max_driver_words=0,
                merge_batch=mb,
                stats=stats,
            )
            wall = time.time() - t0
            sizes = stats.get("batch_sizes", [])
            q = max(1, len(sizes) // 4)
            out = {
                "leg": leg,
                "merge_batch": mb,
                "n_merges": len(merges),
                "rounds": stats["rounds"],
                "wall_sec": round(wall, 1),
                "avg_batch": round(
                    len(merges) / max(1, stats["rounds"]), 2
                ),
                # does the realized batch grow as symbols lengthen and
                # diversify? first vs last quartile of per-round sizes
                "avg_batch_first_q": round(sum(sizes[:q]) / q, 2),
                "avg_batch_last_q": round(sum(sizes[-q:]) / q, 2),
            }
            results.append((merges, out))
            print(json.dumps(out), flush=True)
        assert results[0][0] == results[1][0], "batched != per-merge!"
        print(
            json.dumps(
                {
                    "leg": leg,
                    "parity": "identical merges",
                    "round_reduction": round(
                        results[1][1]["rounds"] / results[0][1]["rounds"], 2
                    ),
                    "wall_reduction": round(
                        results[1][1]["wall_sec"]
                        / max(0.001, results[0][1]["wall_sec"]),
                        2,
                    ),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
