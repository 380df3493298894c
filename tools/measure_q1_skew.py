"""Q1 sessionization hot-key skew measurement (VERDICT r13 #6).

Builds a 10x events fixture where ONE userid carries ~20% of all events
(the remapped rows keep distinct (ts, globalseq), so the hot user has
real session structure — thousands of sessions, not one giant one), then
times, with AQE on (the production default the old module-header claim
leaned on):

  1. plain ``sessionize``   — groupBy(userid, session_window): the hot
     user's whole event mass hashes to ONE task;
  2. ``sessionize_two_phase`` — time-salted (userid, chunk) partials +
     sessions-scale boundary merge (equality pinned in tests/test_skew.py).

Also reports the per-task input-row spread of the plain path's final
aggregation stage (via a proxy: rows per userid-hash partition), which is
the quantity AQE would have to split and does not (its skew handling is
join-only — OptimizeSkewedJoin; there is no aggregation analog).

Numbers land in PLANS.md by hand (host-throttle caveat as scale10x.py).

Usage: python tools/measure_q1_skew.py [factor]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 10
HOT_SHARE = float(os.environ.get("Q1_SKEW_HOT_SHARE", "0.20"))
ID_STRIDE = 10_000_000
HOT_USER = 424242


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .appName("q1-skew")
        .getOrCreate()
    )
    from flink_clickstream_processor_msk_spark.operators.sessionize import (
        sessionize,
        sessionize_two_phase,
    )
    from flink_clickstream_processor_msk_spark.sources.clickevents import (
        read_clickevents,
        with_event_time,
    )

    base = with_event_time(read_clickevents(spark, SF_DIR))
    # FACTOR replicas with shifted userid/globalseq and shifted ts per
    # replica (x seconds) so replica sessions don't merge; then remap
    # HOT_SHARE of rows (uniform hash slice) onto ONE userid
    reps = [
        base.select(
            (F.col("userid") + F.lit(i * ID_STRIDE)).alias("userid"),
            (F.col("globalseq") + F.lit(i * ID_STRIDE)).alias("globalseq"),
            (F.col("ts") + F.expr(f"interval {i} seconds")).alias("ts"),
            (F.col("eventtimestamp") + F.lit(i * 1000)).alias("eventtimestamp"),
            "event_type",
            "product_type",
        )
        for i in range(FACTOR)
    ]
    big = reps[0]
    for r in reps[1:]:
        big = big.unionByName(r)
    skewed = big.withColumn(
        "userid",
        F.when(
            F.pmod(F.xxhash64("globalseq"), F.lit(100)) < F.lit(int(HOT_SHARE * 100)),
            F.lit(HOT_USER),
        ).otherwise(F.col("userid")),
    ).persist()
    n = skewed.count()
    hot_n = skewed.filter(F.col("userid") == HOT_USER).count()
    print(f"rows={n} hot_rows={hot_n} ({hot_n / n:.1%})")

    def timed(tag, df):
        best = None
        for _ in range(3):
            t0 = time.monotonic()
            df.select(F.sum(F.col("eventCount").cast("bigint"))).collect()
            w = time.monotonic() - t0
            best = w if best is None else min(best, w)
        print(f"{tag}: best-of-3 {best:.3f}s")
        return best

    balanced = big.persist()
    balanced.count()
    timed("plain sessionize, BALANCED control (no hot user)", sessionize(balanced))
    balanced.unpersist()
    plain = timed("plain sessionize (AQE on)", sessionize(skewed))
    two = timed("sessionize_two_phase", sessionize_two_phase(skewed))
    # the skew itself: rows per 32-way hash partition of userid — the
    # distribution the plain path's exchange hands its reduce tasks
    spread = (
        skewed.groupBy(F.pmod(F.hash("userid"), F.lit(32)).alias("pt"))
        .count()
        .agg(F.max("count").alias("mx"), F.avg("count").alias("avg"))
        .first()
    )
    print(
        f"plain-path reduce input skew: max/mean = {spread['mx'] / spread['avg']:.2f}"
        f" (max {spread['mx']} rows in one task's key space)"
    )
    print(f"speedup two-phase vs plain: {plain / two:.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
