"""Streaming ingest deduplication — effectively-once over at-least-once
sources.

The reference consumes MSK/Kafka with at-least-once delivery: broker
retries and consumer-group rebalances replay records, and the reference
job simply re-processes them (its sinks tolerate it; see the epoch-dedup
wrapper in streaming/sinks.py for the sink-side half). For a
training-data ingest that MATERIALIZES events, replays must be dropped at
the source instead — once per key, with bounded state.

Spark-first shape: ``dropDuplicatesWithinWatermark`` keeps one row per
key and — unlike plain ``dropDuplicates`` on a stream, whose key state
grows forever — evicts state once the watermark passes a key's event
time, so state is bounded by (watermark delay × ingest rate) regardless
of how long the job runs. That is the 100 TB/continuous-ingest design:
replays arrive within broker-retry horizons (seconds-minutes), so the
watermark delay covers them and a year-long run holds minutes of keys.

The natural ClickEvent key is (userid, globalseq): the producer assigns
``globalseq`` monotonically (ClickEvent.avsc: globalseq), so a replayed
record carries the same pair while two distinct events never do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

DEDUP_KEYS = ("userid", "globalseq")


def dedup_events(clickevents: DataFrame, keys: tuple[str, ...] = DEDUP_KEYS) -> DataFrame:
    """Drop replayed duplicates of a watermarked ClickEvent stream.

    ``clickevents`` must already carry the event-time watermark (the
    source layer applies it — sources.clickevents.with_event_time);
    duplicates of a key arriving within the watermark delay are dropped,
    and the key's state is evicted once the watermark passes it. On a
    batch DataFrame (where dropDuplicatesWithinWatermark is rejected by
    the analyzer) the same semantics over a finite input is plain
    per-key ``dropDuplicates`` — used by the batch-equals-streaming test
    harness.
    """
    if clickevents.isStreaming:
        return clickevents.dropDuplicatesWithinWatermark(list(keys))
    return clickevents.dropDuplicates(list(keys))
