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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from flink_clickstream_processor_msk_spark import get_spark
    from flink_clickstream_processor_msk_spark.sources.clickevents import (
        clickevents_from_events,
        with_event_time,
    )
    from flink_clickstream_processor_msk_spark.streaming.pipeline import build_streams

    spark = get_spark(app_name="bench-streaming")
    src_file = f"{sf_dir}/events.parquet"
    n_events = spark.read.parquet(src_file).count()  # doubles as JVM warmup
    schema = spark.read.parquet(src_file).schema

    # the file stream source wants a directory; stage the table into one
    src = tempfile.mkdtemp(prefix="bench-streaming-src-")
    shutil.copy(src_file, os.path.join(src, "events.parquet"))

    raw = spark.readStream.schema(schema).parquet(src)
    clickevents = with_event_time(clickevents_from_events(raw), watermark="0 seconds")
    streams = build_streams(clickevents)  # reference constants: 1 s gap, 10 s windows

    outputs = [
        streams.user_sessions,
        streams.buy_sessions,
        streams.session_stats,
        streams.department_counts,
    ]
    # fresh checkpoint dirs per run (a reused dir would resume finished
    # offsets/state and corrupt the measurement); all cleaned up below
    ckpts = [tempfile.mkdtemp(prefix=f"bench-streaming-ckpt-{i}-") for i in range(len(outputs))]
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
    for path in [src, *ckpts]:
        shutil.rmtree(path, ignore_errors=True)

    # four concurrent queries each consume the full stream (multi-query
    # fan-out re-reads a replayable source); events/s is pipeline-level:
    # source events fully processed through all four outputs per second
    print(
        json.dumps(
            {
                "metric": "streaming_events_per_sec",
                "value": round(n_events / wall, 1),
                "unit": "events/sec",
                "events": n_events,
                "wall_sec": round(wall, 3),
                "sf": sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
