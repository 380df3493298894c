"""Measure salted_join vs a plain shuffle join on a hot-key fixture
(VERDICT r6 #4: the utility was identity-tested but never shown to win).

Fixture: an 8M-row fact table where 90% of rows carry ONE key (the rest
uniform over 2k keys) joined to a 2k-row dimension, with broadcast joins
DISABLED — salting only matters when the small side cannot broadcast (a
broadcast join has no shuffle and therefore no reducer skew; at cluster
scale the analogous case is a dimension too large for the driver/executor
memory or a fact-fact join). AQE (incl. skew-join) stays ON — the point is
to measure the case AQE does NOT fix: the hot key hashes to ONE reducer
whose partition (~tens of MB here) sits far below
`skewedPartitionThresholdInBytes` (256 MB default), so AQE sees no "skewed
partition" yet one task does 90% of the join work.

Timed work: join + per-key aggregate, forced through a noop write.
Prints one JSON line with median-of-3 wall seconds per strategy:
plain, salted n_salt=8, salted n_salt=16.

Recorded result (round 7, local[32]): PLANS.md "Round-7 additions".
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

N_FACT = 8_000_000
N_KEYS = 2_000
HOT_SHARE = 0.9


def build_frames(spark):
    # deterministic skew: first 90% of ids -> key 0, rest uniform
    fact = spark.range(N_FACT, numPartitions=32).select(
        F.when(F.col("id") < int(N_FACT * HOT_SHARE), F.lit(0))
        .otherwise((F.col("id") % (N_KEYS - 1)) + 1)
        .cast("int")
        .alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(N_KEYS).select(
        F.col("id").cast("int").alias("k"),
        F.concat(F.lit("name"), F.col("id")).alias("name"),
    )
    return fact, dim


def time_strategy(spark, fact, dim, strategy, n_salt=None, runs=3):
    from flink_clickstream_processor_msk_spark.operators.skew import salted_join

    walls = []
    for _ in range(runs):
        start = time.perf_counter()
        joined = (
            fact.join(dim, on=["k"])
            if strategy == "plain"
            else salted_join(fact, dim, ["k"], n_salt=n_salt)
        )
        (
            joined.groupBy("k", "name")
            .agg(F.sum("v").alias("sv"), F.count(F.lit(1)).alias("n"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        walls.append(time.perf_counter() - start)
    return round(statistics.median(walls), 3), [round(w, 3) for w in sorted(walls)]


def main() -> None:
    from flink_clickstream_processor_msk_spark import get_spark

    spark = get_spark(app_name="measure-salted-join")
    spark.sparkContext.setLogLevel("ERROR")
    # the regime salting exists for: small side NOT broadcastable
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    fact, dim = build_frames(spark)
    fact.write.format("noop").mode("overwrite").save()  # warm

    out = {}
    med, spread = time_strategy(spark, fact, dim, "plain")
    out["plain"] = {"med_sec": med, "runs": spread}
    for n_salt in (8, 16):
        med, spread = time_strategy(spark, fact, dim, "salted", n_salt=n_salt)
        out[f"salted_{n_salt}"] = {"med_sec": med, "runs": spread}
    print(json.dumps({"metric": "salted_join_wall_sec", "fixture": {
        "n_fact": N_FACT, "n_keys": N_KEYS, "hot_share": HOT_SHARE,
        "broadcast": "disabled", "aqe": "on"}, "strategies": out}))
    spark.stop()


if __name__ == "__main__":
    main()
