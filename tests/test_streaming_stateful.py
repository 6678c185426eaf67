"""Stateful streaming sessionizer (applyInPandasWithState): closed sessions
must match the batch lag+sum sessionizer exactly, including sessions that
span a micro-batch boundary (state carried through the checkpoint)."""

from __future__ import annotations

import datetime

from pyspark.sql import Window, functions as F

from pdf_extractor_spark.streaming.stateful import sessionize_stream

BASE = datetime.datetime(2024, 3, 1, 10, 0, 0)


def _m(minutes: float) -> datetime.datetime:
    return BASE + datetime.timedelta(minutes=minutes)


# user 1: session A (0..10), gap >30, session B (60..65) spanning batches,
#         gap >30 in batch 2 closes B, session C (120..) closed by batch 3,
#         batch 4 delivers WITHIN-WATERMARK LATE events that precede the
#         open session D's start: 151 (>gap before 200 -> own session) and
#         182 (<=gap before 200 -> merges into D, widening it)
# user 2: one session entirely in batch 1, closed by a batch-2 event >gap later
# user 3: single event whose value ends in .xx5 — F.round is HALF_UP, so the
#         stream must emit 2.35 (Python round() would emit 2.34)
BATCH1 = [
    (1, _m(0), 1.0),
    (1, _m(5), 2.0),
    (1, _m(10), 3.0),
    (1, _m(60), 4.0),
    (2, _m(0), 10.0),
    (2, _m(20), 20.0),
    (3, _m(0), 2.345),
]
BATCH2 = [
    (1, _m(65), 5.0),  # continues session B across the batch boundary
    (1, _m(120), 6.0),  # >30 min after 65 -> closes B, opens C
    (2, _m(90), 30.0),  # >30 min after 20 -> closes user 2's first session
    (3, _m(40), 1.0),  # closes user 3's .xx5 session
]
BATCH3 = [
    (1, _m(200), 7.0),  # closes C, opens D
]
BATCH4 = [
    # late but within the 120-min watermark; both precede D's start (200)
    (1, _m(151), 8.0),  # >gap before D AND >gap after C -> its own session
    (1, _m(182), 9.0),  # <=gap before D -> widens D (stays open)
]
SCHEMA = "user_id bigint, ts timestamp, value double"


def _batch_sessions(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    w = Window.partitionBy("user_id").orderBy("ts")
    epoch = F.unix_timestamp("ts")
    gap = epoch - F.lag(epoch).over(w)
    flagged = df.withColumn(
        "new_session", F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0)
    )
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = flagged.withColumn("sid", F.sum("new_session").over(running))
    out = sess.groupBy("user_id", "sid").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("session_value"),
    )
    return {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["session_value"])
        for r in out.collect()
    }


def _run_once(spark, src, ckpt, sink):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    # watermark 120 min > gap 30 min so a within-watermark event can still be
    # earlier than (open-session start - gap) — the late-merge test cases
    q = (
        sessionize_stream(stream, gap_minutes=30, watermark_delay="120 minutes")
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_stateful_sessionize_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    for batch in (BATCH1, BATCH2, BATCH3, BATCH4):
        spark.createDataFrame(batch, SCHEMA).write.mode("append").parquet(src)
        _run_once(spark, src, ckpt, sink)

    emitted = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["session_value"])
        for r in spark.read.parquet(sink).collect()
    }
    batch = _batch_sessions(spark, BATCH1 + BATCH2 + BATCH3 + BATCH4)

    # every emitted session is exactly a batch session (same boundaries,
    # counts, sums) — no partial or duplicated emissions
    assert emitted <= batch, emitted - batch

    # the gap-closed sessions MUST all have emitted: user 1's session A
    # (closed within batch 1), session B (spans the boundary, closed by the
    # batch-2 gap — proves state carried through the checkpoint), session C
    # (closed by batch 3), the LATE batch-4 event at 151 (>gap before open
    # session D's start -> its own session, not a widened D), user 2's first
    # session, and user 3's half-up .xx5 session (2.345 -> 2.35, not the
    # banker's 2.34)
    must_close = {
        (1, _m(0), _m(10), 3, 6.0),
        (1, _m(60), _m(65), 2, 9.0),
        (1, _m(120), _m(120), 1, 6.0),
        (1, _m(151), _m(151), 1, 8.0),
        (2, _m(0), _m(20), 2, 30.0),
        (3, _m(0), _m(0), 1, 2.35),
    }
    assert must_close <= emitted, must_close - emitted

    # still-open sessions must NOT have emitted: user 1's D (widened by the
    # within-gap late event 182 -> start 182, end 200) and user 2's last.
    # user 3's (40..40) session MAY emit via the event-time timeout once the
    # watermark (200 - 120min = 80) passes 40 + gap = 70 — that emission is
    # also a valid batch session, covered by the subset assertion above.
    open_sessions = {
        (1, _m(182), _m(200), 2, 16.0),
        (1, _m(200), _m(200), 1, 7.0),  # D must NOT emit un-widened either
        (2, _m(90), _m(90), 1, 30.0),
    }
    assert not (open_sessions & emitted)
