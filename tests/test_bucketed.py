from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from pdf_extractor_spark.sources.bucketed import read_table, write_bucketed

SF_DIR = "/root/testdata/sf0.001"


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    left = docs.select("doc_id", "lang", "n_chars")
    right = docs.select("doc_id", F.md5("text").alias("content_md5"))
    write_bucketed(left, "bk_left", str(tmp_path / "left"), "doc_id", 8)
    write_bucketed(right, "bk_right", str(tmp_path / "right"), "doc_id", 8)
    yield "bk_left", "bk_right"
    spark.sql("DROP TABLE IF EXISTS bk_left")
    spark.sql("DROP TABLE IF EXISTS bk_right")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    """Two tables bucketed on the join key with equal bucket counts join
    with ZERO shuffle: no Exchange node anywhere in the physical plan."""
    lname, rname = bucketed_pair
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a non-broadcast join so the Exchange-free claim is real
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = read_table(spark, lname).join(
            read_table(spark, rname), "doc_id"
        )
        plan = _formatted_plan(joined)
        assert re.search(r"\(\d+\) SortMergeJoin", plan), plan
        assert not re.search(r"\(\d+\) Exchange", plan), plan
        # and the join is still correct
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        assert joined.count() == docs.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucket_pruning_on_point_lookup(spark, bucketed_pair):
    """A bucket-key point filter scans ONE bucket's files, not the table.

    The autoBucketedScan heuristic turns OFF bucketed reading when the
    query has no exchange to save (a bare filter), which also forfeits
    bucket pruning — pin it off so the pruned scan is the one planned,
    exactly what a point-lookup-heavy workload would configure."""
    lname, _ = bucketed_pair
    prev = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    try:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
        )
        plan = _formatted_plan(
            read_table(spark, lname).filter(F.col("doc_id") == 7)
        )
        assert re.search(r"SelectedBucketsCount: 1 out of 8", plan), plan
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", prev
        )


def test_mismatched_bucket_counts_fall_back(spark, bucketed_pair, tmp_path):
    """A table bucketed with a DIFFERENT count still joins correctly (Spark
    shuffles one side) — layout drift degrades to a shuffle, never to a
    wrong answer."""
    lname, _ = bucketed_pair
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    write_bucketed(
        docs.select("doc_id", "source"),
        "bk_other",
        str(tmp_path / "other"),
        "doc_id",
        4,
    )
    try:
        joined = read_table(spark, lname).join(
            read_table(spark, "bk_other"), "doc_id"
        )
        assert joined.count() == docs.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_other")
