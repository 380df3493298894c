"""Isolated per-query measurement (BASELINE.md row generator).

Usage: python tools/measure_query.py <query> [<query> ...] [--n 5]

Runs the named __spark_entry__.queries() entries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) with the same warmup + CACHE_DEPS re-warm
discipline as bench.py, printing per-run timings so a BASELINE.md
"isolated best-of-N" row can be recorded.  Exists because CLAUDE.md's
hard rule ("new driver queries need a BASELINE.md per-query row,
isolated best-of-3 at sf0.1") was previously serviced by ad-hoc
one-off scripts that never got committed.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    argv = sys.argv[1:]
    n = 5
    args: list[str] = []
    i = 0
    while i < len(argv):
        if argv[i] == "--n":
            n = int(argv[i + 1])
            i += 2
        else:
            args.append(argv[i])
            i += 1
    if not args:
        print("usage: measure_query.py <query> [...] [--n 5]", file=sys.stderr)
        sys.exit(2)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry_mod
    from flink_clickstream_processor_msk_spark import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(app_name="measure_query")
    # same generic warmup as bench.py: JIT, codegen, Arrow worker pool
    spark.range(10_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    ncpu = spark.sparkContext.defaultParallelism
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    @pandas_udf("long", PandasUDFType.SCALAR)
    def _warm(s):
        return s

    spark.range(ncpu * 4, numPartitions=ncpu).select(_warm("id")).write.format(
        "noop"
    ).mode("overwrite").save()

    qs = entry_mod.queries()
    for name in args:
        fn = qs[name]
        deps = entry_mod.CACHE_DEPS.get(name, ())
        runs = []
        for _ in range(n):
            entry_mod.warm_caches(spark, sf_dir, deps)
            start = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - start, 3))
            spark.catalog.clearCache()
        print(f"{name}: runs={runs} best={min(runs)}")


if __name__ == "__main__":
    main()
