"""Per-partition lineage rows (north rule; analog of the reference's token
accounting, reference src/extractor.py:103-110, main.py:766-767).

``lineage_for`` derives, per physical partition of the extracted DataFrame:
``(partition_id, doc_count, bytes_in, bytes_out, checkpoint_marker)``.

This is a pure DataFrame aggregation over ``spark_partition_id()`` — it runs
JVM-side, costs one pass, and its partition-count spread is how the skew tests
verify the salting policy actually flattened the Zipf hosts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

LINEAGE_COLUMNS = [
    "partition_id",
    "doc_count",
    "bytes_in",
    "bytes_out",
    "checkpoint_marker",
]


def with_partition_id(df: DataFrame) -> DataFrame:
    return df.withColumn("partition_id", F.spark_partition_id())


def lineage_for(
    extracted: DataFrame,
    checkpoint_marker: str,
    in_col: str = "html",
    out_col: str = "text",
) -> DataFrame:
    """Aggregate lineage metrics per physical partition of ``extracted``."""
    return (
        with_partition_id(extracted)
        .groupBy("partition_id")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.coalesce(F.sum(F.length(F.col(in_col))), F.lit(0)).alias("bytes_in"),
            F.coalesce(F.sum(F.length(F.col(out_col))), F.lit(0)).alias("bytes_out"),
        )
        .withColumn("checkpoint_marker", F.lit(checkpoint_marker))
        .select(*LINEAGE_COLUMNS)
    )
