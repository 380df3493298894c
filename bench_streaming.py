"""Streaming throughput benchmark — the self-set baseline BASELINE.md records.

Replays the sf-tier `events` table through the full micro-batch pipeline
(source shim → watermark → Q1 session windows → {buy filter, Q2, Q3}) with
noop sinks, and reports end-to-end events/s. The reference publishes no
numbers (BASELINE.md); this measurement is the repo's own bar: stay within
2× of the recorded value at the same scale factor.

Prints one JSON line:
    {"metric": "streaming_events_per_sec", "value": N, "unit": "events/sec",
     "events": n, "wall_sec": s, "sf": dir}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _run_pipeline(spark, src: str, schema) -> float:
    """One full pass of the reference-parity pipeline over the staged source
    directory; returns wall seconds from query start to all-processed.

    Sink set matches the reference job graph (CP:227,240,251 — and the same
    three streams again at the ES sinks, CP:265-267): buy-filtered sessions,
    Q2, Q3. The unfiltered Q1 stream is never sunk by the reference.
    """
    from flink_clickstream_processor_msk_spark.sources.clickevents import (
        clickevents_from_events,
        with_event_time,
    )
    from flink_clickstream_processor_msk_spark.streaming.pipeline import build_streams

    raw = spark.readStream.schema(schema).parquet(src)
    clickevents = with_event_time(clickevents_from_events(raw), watermark="0 seconds")
    streams = build_streams(clickevents)  # reference constants: 1 s gap, 10 s windows
    outputs = [
        streams.buy_sessions,
        streams.session_stats,
        streams.department_counts,
    ]
    # fresh checkpoint dirs per run (a reused dir would resume finished
    # offsets/state and corrupt the measurement)
    ckpts = [
        tempfile.mkdtemp(prefix=f"bench-streaming-ckpt-{i}-")
        for i in range(len(outputs))
    ]
    start = time.perf_counter()
    queries = [
        df.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
        for df, ckpt in zip(outputs, ckpts)
    ]
    for q in queries:
        q.processAllAvailable()
    for q in queries:
        q.stop()
    wall = time.perf_counter() - start
    for path in ckpts:
        shutil.rmtree(path, ignore_errors=True)
    return wall


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from flink_clickstream_processor_msk_spark import get_spark

    spark = get_spark(app_name="bench-streaming")
    src_file = f"{sf_dir}/events.parquet"
    n_events = spark.read.parquet(src_file).count()  # doubles as JVM warmup
    schema = spark.read.parquet(src_file).schema

    # the file stream source wants a directory; stage the table into one
    src = tempfile.mkdtemp(prefix="bench-streaming-src-")
    shutil.copy(src_file, os.path.join(src, "events.parquet"))

    # warmup: one untimed pass of the same three-query pipeline over a small
    # slice, so the timed run measures steady-state throughput rather than
    # streaming-plan codegen/JIT (measured ~1.5x on the cold first pass)
    warm_src = tempfile.mkdtemp(prefix="bench-streaming-warm-")
    spark.read.parquet(src_file).limit(5000).write.mode("overwrite").parquet(warm_src)
    _run_pipeline(spark, warm_src, schema)
    shutil.rmtree(warm_src, ignore_errors=True)

    # multiple timed passes: this host throttles intermittently under
    # sustained load (BASELINE.md caveat), so a single pass can read 20-30%
    # low; the spread pins the band, best-of-N is the steady-state estimate
    n_runs = max(1, int(os.environ.get("BENCH_STREAMING_RUNS", "3")))
    walls = sorted(_run_pipeline(spark, src, schema) for _ in range(n_runs))
    shutil.rmtree(src, ignore_errors=True)
    wall = walls[0]

    # three concurrent queries each consume the full stream (multi-query
    # fan-out re-reads a replayable source); events/s is pipeline-level:
    # source events fully processed through all three outputs per second
    print(
        json.dumps(
            {
                "metric": "streaming_events_per_sec",
                "value": round(n_events / wall, 1),
                "unit": "events/sec",
                "events": n_events,
                "wall_sec": round(wall, 3),
                "events_per_sec_spread": {
                    "min": round(n_events / walls[-1], 1),
                    "med": round(n_events / walls[len(walls) // 2], 1),
                    "max": round(n_events / walls[0], 1),
                    "n": n_runs,
                },
                "sf": sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
