"""Measure connected-components ROUNDS + wall on adversarial long chains.

The dedup family resolver went from distributed min-label propagation
(rounds = component diameter) to alternating large-star/small-star
contraction (Kiveris et al. 2014 — rounds = O(log² n)) in round 12. A
transitive dup CHAIN of length L is exactly what near-dup families
produce (a~b, b~c, ...), and it is the worst case for label propagation:
L join+groupBy rounds. This harness builds chain graphs at 1× and 10×
and runs BOTH algorithms (label propagation is reproduced inline — it is
no longer in the library) so the round-count claim stays checkable.

Usage: python tools/measure_cc_rounds.py [chain_len] (default 120)
Prints one JSON line per (algo, scale).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from flink_clickstream_processor_msk_spark import get_spark  # noqa: E402
from flink_clickstream_processor_msk_spark.operators.dedup import (  # noqa: E402
    _materialized,
    connected_components,
)


def chain_edges(spark, length: int):
    return spark.range(length).select(
        (F.col("id") + 1).alias("doc_a"), F.col("id").alias("doc_b")
    )


def min_label_rounds(edges, max_iterations: int = 100_000):
    """The replaced algorithm, verbatim shape: min over neighbors + self
    per round, sum(lbl) as the monotone convergence metric. On a chain of
    length L it needs exactly L+1 rounds (the label walks one hop per
    round), so the harness runs a CAPPED window to measure sec/round and
    projects the full wall — running 1201 rounds to completion is the
    cost being demonstrated, not a useful measurement."""
    spark = edges.sparkSession
    raw = edges.select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    ).union(edges.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b")))
    vertices = raw.select(F.col("a").alias("id")).distinct()
    sym = _materialized(
        raw.union(
            vertices.select(F.col("id").alias("a"), F.col("id").alias("b"))
        )
    )
    sym.count()
    labels = _materialized(vertices.select("id", F.col("id").alias("lbl")))
    prev_total = labels.agg(F.sum("lbl")).collect()[0][0]
    for rounds in range(1, max_iterations + 1):
        new_labels = (
            sym.join(labels.withColumnRenamed("id", "b"), "b")
            .select(F.col("a").alias("id"), "lbl")
            .groupBy("id")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint()
        )
        total = new_labels.agg(F.sum("lbl")).collect()[0][0]
        labels = new_labels
        if total == prev_total:
            out = {r["id"]: r["lbl"] for r in labels.collect()}
            sym.unpersist()
            return rounds, out
        prev_total = total
    sym.unpersist()
    return None, None  # capped out: did not converge inside the window


def star_rounds(spark, edges):
    stats: dict = {}
    labels = connected_components(
        edges, "doc_a", "doc_b",
        max_iterations=50, small_graph_edge_rows=0, stats=stats,
    )
    out = {r["id"]: r["lbl"] for r in labels.collect()}
    labels.unpersist()
    return stats["rounds"], out


def main() -> None:
    length = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    cap = 25  # min-label measurement window (sec/round sample)
    spark = get_spark(app_name="measure-cc-rounds", shuffle_partitions=8)
    for scale, n in (("1x", length), ("10x", length * 10)):
        edges = _materialized(chain_edges(spark, n))
        edges.count()
        t0 = time.perf_counter()
        rounds_star, star_labels = star_rounds(spark, edges)
        star_wall = time.perf_counter() - t0
        assert set(star_labels.values()) == {0}
        assert len(star_labels) == n + 1
        t0 = time.perf_counter()
        rounds_lp, _ = min_label_rounds(edges, max_iterations=cap)
        lp_window = time.perf_counter() - t0
        assert rounds_lp is None, "chain converged inside the cap?"
        sec_per_round = lp_window / cap
        print(
            json.dumps(
                {
                    "metric": "cc_rounds_chain",
                    "scale": scale,
                    "chain_len": n,
                    "star_rounds": rounds_star,
                    "star_wall_sec": round(star_wall, 2),
                    "minlabel_rounds_needed": n + 1,
                    "minlabel_sec_per_round": round(sec_per_round, 3),
                    "minlabel_projected_wall_sec": round(
                        sec_per_round * (n + 1), 1
                    ),
                }
            )
        )
        edges.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
