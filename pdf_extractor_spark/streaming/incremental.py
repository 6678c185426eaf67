"""Time-windowed incremental batches over warc_ts (SURVEY.md §2.9).

``process_time_range`` runs the extraction pipeline over one warc_ts window
(partition-prunable when the input table is partitioned by day); combined
with the snapshot catalog's anti-join resume, repeated invocations give
exactly-once-per-url incremental processing — the distributed analog of the
reference's upload cache (reference src/pdf_uploader.py:25,51-54).
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession, functions as F

from pdf_extractor_spark.pipeline import run_extraction_job


def process_time_range(
    spark: SparkSession,
    input_df: DataFrame,
    output_table: str,
    start: datetime.datetime,
    end: datetime.datetime,
    n_partitions: int | None = None,
) -> dict:
    """Extract docs with start <= warc_ts < end, resuming past commits.

    The warc_ts filter lands in PushedFilters on the scan; on a
    date-partitioned table it prunes partitions before any IO.
    """
    window = input_df.filter(
        (F.col("warc_ts") >= F.lit(start)) & (F.col("warc_ts") < F.lit(end))
    )
    return run_extraction_job(
        spark, window, output_table, n_partitions=n_partitions, resume=True
    )


def process_in_batches(
    spark: SparkSession,
    input_df: DataFrame,
    output_table: str,
    batch: datetime.timedelta,
    n_partitions: int | None = None,
) -> list[dict]:
    """Drive the whole table as consecutive warc_ts micro-batches."""
    bounds = input_df.agg(
        F.min("warc_ts").alias("lo"), F.max("warc_ts").alias("hi")
    ).first()
    if bounds["lo"] is None:
        return []
    lo, hi = bounds["lo"], bounds["hi"]
    out = []
    cur = lo
    while cur <= hi:
        nxt = cur + batch
        out.append(
            process_time_range(spark, input_df, output_table, cur, nxt, n_partitions)
        )
        cur = nxt
    return out
