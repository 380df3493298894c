"""Adjudicate dedup_simhash IN SUITE CONTEXT (VERDICT r13 wrong #2).

Two driver rounds in a row read dedup_simhash ~1.6× its BASELINE best in
the full bench suite, while isolated best-of-5 keeps saying ~1.0×. This
harness measures the query the way the suite does — same session, same
clearCache discipline, immediately after the SAME preceding block
(…, remove_dup_spans, dedup_exact, lm_bigram_score, dedup_ngram_jaccard)
— against a same-session isolated reading taken BEFORE the block, cycling
N times:

    isolated_pre → [preceding block in suite order] → in_slot → post

If in_slot ≈ isolated_pre across cycles, the driver reading is window
noise (the r13 adjudication stands and BASELINE.md documents a
suite-context band). If in_slot is consistently high, the interaction is
real and named (GC pressure / executor-cache eviction from the
persist-heavy dedup block are the candidates).

Usage: python tools/measure_simhash_in_suite.py [n_cycles]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CYCLES = int(sys.argv[1]) if len(sys.argv) > 1 else 3
TARGET = "dedup_simhash"
N_PRECEDING = 6


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry_mod
    from flink_clickstream_processor_msk_spark import get_spark

    spark = get_spark(app_name="simhash-in-suite")
    spark.range(10_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    queries = entry_mod.queries()
    names = list(queries)
    idx = names.index(TARGET)
    block = names[max(0, idx - N_PRECEDING) : idx]
    print(json.dumps({"preceding_block": block}), flush=True)

    def run(name: str) -> float:
        deps = entry_mod.CACHE_DEPS.get(name, ())
        entry_mod.warm_caches(spark, sf_dir, deps)
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        w = time.perf_counter() - t0
        spark.catalog.clearCache()
        return round(w, 3)

    # one untimed warm pass of the target so JIT/codegen is out of every
    # cycle's first reading (the bench's own best-of-2 discipline)
    run(TARGET)
    for cycle in range(N_CYCLES):
        iso_pre = run(TARGET)
        block_walls = {n: run(n) for n in block}
        in_slot = run(TARGET)
        post = run(TARGET)
        print(
            json.dumps(
                {
                    "cycle": cycle,
                    "isolated_pre": iso_pre,
                    "in_slot": in_slot,
                    "post": post,
                    "block": block_walls,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
