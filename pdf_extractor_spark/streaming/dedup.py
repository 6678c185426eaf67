"""Streaming deduplication: drop at-least-once re-deliveries inside the
watermark window.

A crawl feed (or any at-least-once bus) re-delivers records; the batch
engine dedupes with a first-seen groupBy (operators/merges.py,
d_exact_dup_groups), and this is the unbounded-feed twin:
``dropDuplicatesWithinWatermark`` keeps one row per key among duplicates
whose event times land within the watermark delay of each other — state
for a key is dropped once the watermark passes it, so state size is
O(keys per watermark window), not O(stream history).

Semantics vs batch: for a feed whose re-deliveries always arrive within
the watermark delay (the at-least-once contract), the kept-row KEY SET
equals the batch ``dropDuplicates(keys)`` result — asserted across
micro-batch boundaries in tests/test_streaming.py (maxFilesPerTrigger=1
forces the duplicates into different micro-batches, so the state store,
not the batch-local dedup, does the work).

Scale notes: the shuffle key is the dedup key (uniform ids hash evenly);
RocksDB state store for key counts beyond executor memory; the watermark
delay bounds both state retention and the re-delivery horizon the
operator tolerates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    df: DataFrame,
    key_cols: list[str] | tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Keep one row per key among watermark-window duplicates.

    Works on a streaming OR batch DataFrame (on batch,
    dropDuplicatesWithinWatermark degenerates to dropDuplicates — useful
    for backfills through the same code path).
    """
    return df.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        list(key_cols)
    )
