"""Measure the sample-trained BPE fidelity/cost trade (VERDICT r13 #5).

Even batched, a 32k-merge vocabulary needs ~n_merges/2.3 Spark rounds —
job-count bound. The standard production answer is training on a corpus
SAMPLE (`train_bpe_merges(sample_fraction=...)`, deterministic h60 doc
slice): merge statistics are Zipf-dominated, so a sample preserves the
head that decides merges, and a sample whose vocabulary fits
``max_driver_words`` collapses training to the driver greedy loop —
ZERO Spark rounds, exactly how real tokenizer trainers work (in-memory
over a sample).

Two legs:

- ``rich``: a seeded 20k-word syllable/Zipf corpus (vocabulary-rich —
  the regime a real tokenizer trains in) + a held-out corpus from the
  same distribution (different seed). Trains full vs sample_fraction at
  ``N_MERGES`` and reports wall + held-out fertility for each (the
  fidelity number: how much worse does the sampled tokenizer size
  unseen text).
- ``testdata``: the 10x documents tier (tools/scale10x.py output), with
  sf0.01 documents as the held-out set. Honest caveat: its ~40-word
  vocabulary exhausts BPE at ~100 merges, so this leg measures the
  sampling WALL saving on driver data, not deep-merge fidelity.

Usage:
    python tools/measure_bpe_sample.py [n_merges] [sample_fraction] [leg...]

One JSON line per (leg, variant); numbers go into PLANS.md by hand.
Idle-window caveat as every measurement tool here.
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

N_MERGES = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
FRACTION = float(sys.argv[2]) if len(sys.argv) > 2 else 0.25
# set between the sample's and the full corpus's vocabulary sizes to
# demonstrate the round-collapse: full goes distributed (rounds ≈
# n_merges / realized batch), the sample fits the driver (0 rounds)
MAX_DRIVER_WORDS = int(os.environ.get("BPE_MAX_DRIVER_WORDS", "200000"))
LEGS = sys.argv[3:] or ["rich", "testdata"]
FACTOR = int(os.environ.get("SCALE_FACTOR", "10"))
TEN_X = os.environ.get("SCALE_OUT_DIR", f"/tmp/scale{FACTOR}x")


def syllable_corpus(spark, seed: int, n_words: int):
    """Seeded Zipf syllable corpus, one doc per word (the
    measure_bpe_rounds fixture shrunk to keep the 2048-merge reference
    greedy tractable on the driver)."""
    rng = random.Random(seed)
    syl = [
        "ing", "er", "tion", "al", "re", "con", "de", "st", "ly",
        "ment", "pro", "ter", "an", "in", "en", "es", "ar", "or",
        "un", "ab",
    ]
    words = sorted(
        {
            "".join(rng.choice(syl) for _ in range(rng.randint(2, 4)))
            for _ in range(int(n_words * 1.3))
        }
    )[:n_words]
    rows = [
        (i, " ".join([w] * max(1, int(100000 / (i + 1) ** 0.9))))
        for i, w in enumerate(words)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def mixed_corpus(spark, seed: int, n_docs: int):
    """Zipf word draws from a shared 20k vocabulary, ~150 words per doc —
    the realistic regime where document sampling preserves the frequent
    vocabulary (words co-occur across documents)."""
    rng = random.Random(seed)
    syl = [
        "ing", "er", "tion", "al", "re", "con", "de", "st", "ly",
        "ment", "pro", "ter", "an", "in", "en", "es", "ar", "or",
        "un", "ab",
    ]
    vrng = random.Random(7)  # vocabulary fixed across train/holdout seeds
    words = sorted(
        {
            "".join(vrng.choice(syl) for _ in range(vrng.randint(2, 4)))
            for _ in range(26000)
        }
    )[:20000]
    n_v = len(words)
    rows = [
        (
            i,
            " ".join(
                words[min(n_v - 1, int(n_v * rng.random() ** 3))]
                for _ in range(rng.randint(100, 200))
            ),
        )
        for i in range(n_docs)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def fertility(docs, merges) -> dict:
    row = text.corpus_fertility(docs, merges=merges).first()
    return {
        "fertility": round(float(row["fertility"]), 5),
        "n_words": int(row["n_words"]),
    }


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("measure_bpe_sample")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    for leg in LEGS:
        if leg == "testdata":
            docs_path = f"{TEN_X}/documents.parquet"
            if not os.path.exists(docs_path):
                raise SystemExit(f"{docs_path} missing - run tools/scale10x.py first")
            docs = spark.read.parquet(docs_path)
            holdout = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        elif leg == "mixed":
            # realistic doc shape: words SPREAD across documents (Zipf
            # draws of a shared vocabulary), so a doc sample keeps the
            # frequent vocabulary — `rich` (one doc per word) is the
            # adversarial bound where sampling deletes 1-fraction of the
            # vocabulary outright
            docs = mixed_corpus(spark, seed=7, n_docs=4000)
            holdout = mixed_corpus(spark, seed=13, n_docs=800)
        else:
            docs = syllable_corpus(spark, seed=7, n_words=20000)
            holdout = syllable_corpus(spark, seed=13, n_words=4000)
        for variant, frac in (("full", None), ("sample", FRACTION)):
            stats: dict = {}
            t0 = time.time()
            merges = text.train_bpe_merges(
                docs,
                N_MERGES,
                max_driver_words=MAX_DRIVER_WORDS,
                stats=stats,
                sample_fraction=frac,
            )
            wall = time.time() - t0
            out = {
                "leg": leg,
                "variant": variant,
                "sample_fraction": frac,
                "n_merges": len(merges),
                "path": stats["path"],
                "rounds": stats["rounds"],
                "train_wall_sec": round(wall, 1),
                "holdout": fertility(holdout, merges),
            }
            print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
