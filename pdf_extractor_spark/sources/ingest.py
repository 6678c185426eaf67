"""Ad-hoc document ingest (SURVEY.md §2.1 S1/S2).

The reference's input is a directory glob of PDFs uploaded one-by-one
(reference main.py:812, src/pdf_uploader.py:27-74). The Spark-native ingest
is the ``binaryFile`` source: one distributed scan, payload + path + mtime,
normalized to the engine's (url, warc_ts, html, text, lang) input schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_binary_documents(
    spark: SparkSession,
    path: str,
    glob: str = "*.pdf",
    recursive: bool = False,
) -> DataFrame:
    """Directory of files -> north-rule input rows.

    - ``url`` = file:// path (stable key for resume/dedupe, the analog of
      the reference's abs-path upload-cache key)
    - ``warc_ts`` = file modification time
    - ``html`` = raw payload bytes (kind sniffed downstream by magic bytes)
    """
    reader = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", str(recursive).lower())
    )
    df = reader.load(path)
    return df.select(
        F.concat(F.lit("file://"), F.col("path")).alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit("").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )
