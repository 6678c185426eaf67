from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from pdf_extractor_spark.operators.bisect import (
    bisect_failed_batches,
    extract_files_with_bisect,
)
from pdf_extractor_spark.sources.sinks import flatten_nested


# ---------------------------------------------------------------- A7 bisect
def test_bisect_isolates_poison_items():
    poison = {17, 58}
    processed: list[int] = []

    def run(batch: list[int]) -> None:
        if any(b in poison for b in batch):
            raise RuntimeError(f"poison in {batch}")
        processed.extend(batch)

    items = list(range(100))
    quarantine = bisect_failed_batches(items, run, batch_size=5)
    assert {q[0] for q in quarantine} == poison
    assert all("poison" in q[1] for q in quarantine)
    # every healthy item processed by exactly one successful call
    assert sorted(processed) == sorted(set(range(100)) - poison)
    assert len(processed) == len(set(processed))


def test_bisect_all_poison_and_empty():
    assert bisect_failed_batches([], lambda b: None) == []

    def always_fail(batch: list[int]) -> None:
        raise ValueError("bad")

    q = bisect_failed_batches([1, 2, 3], always_fail, batch_size=2)
    assert [i for i, _ in q] == [1, 2, 3]  # FIFO left-first order preserved


def test_bisect_call_count_is_logarithmic():
    """One poison item in a batch of 8 costs ~log2(8) extra calls, not 8."""
    calls = 0

    def run(batch: list[int]) -> None:
        nonlocal calls
        calls += 1
        if 6 in batch:
            raise RuntimeError("x")

    bisect_failed_batches(list(range(8)), run, batch_size=8)
    # 1 full batch + split path: [0..3],[4..7],[4,5],[6,7],[6],[7] = 7 calls
    assert calls == 7


def test_extract_files_with_bisect_quarantines_bad_file(spark, tmp_path):
    """File-granular recovery: a job that dies on one input file commits
    every other file exactly once and names the poison file."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    paths = []
    for i in range(6):
        p = tmp_path / f"part-{i}.parquet"
        pq.write_table(pa.table({"doc_id": [i], "text": [f"doc {i}"]}), p)
        paths.append(str(p))
    committed: list[int] = []

    def run_files(files: list[str]) -> None:
        if any(f.endswith("part-3.parquet") for f in files):
            raise RuntimeError("task died: codec segfault")
        rows = spark.read.parquet(*files).select("doc_id").collect()
        committed.extend(r["doc_id"] for r in rows)

    quarantine = extract_files_with_bisect(spark, paths, run_files, batch_size=4)
    assert [f for f, _ in quarantine] == [str(tmp_path / "part-3.parquet")]
    assert sorted(committed) == [0, 1, 2, 4, 5]


# ------------------------------------------------------------- F15 flatten
def test_flatten_nested_recursive(spark):
    df = spark.createDataFrame(
        [
            Row(
                id=1,
                meta=Row(host="a.com", geo=Row(lat=1.5, lon=2.5)),
                tags=["x", "y"],
            )
        ]
    )
    flat = flatten_nested(df)
    assert flat.columns == ["id", "meta.host", "meta.geo.lat", "meta.geo.lon", "tags"]
    row = flat.collect()[0]
    assert row["meta.host"] == "a.com"
    assert row["meta.geo.lon"] == 2.5
    assert row["tags"] == ["x", "y"]  # arrays pass through untouched


def test_flatten_nested_prunes_to_leaves(spark, tmp_path):
    """Selecting one flattened leaf reads ONLY that parquet leaf column."""
    df = spark.createDataFrame(
        [Row(id=i, meta=Row(host=f"h{i}", big="x" * 100)) for i in range(10)]
    )
    p = str(tmp_path / "nested")
    df.write.parquet(p)
    flat = flatten_nested(spark.read.parquet(p)).select("`meta.host`")
    plan = flat._sc._jvm.PythonSQLUtils.explainString(
        flat._jdf.queryExecution(), "formatted"
    )
    assert "big" not in plan  # schema pruning reached the scan
    assert flat.count() == 10


# -------------------------------------------------------- F20 format_size
@pytest.mark.parametrize(
    "n,expected",
    [
        (0, "0.0 B"),
        (1023, "1023.0 B"),
        (1024, "1.0 KB"),
        (1536, "1.5 KB"),
        (1048576, "1.0 MB"),
        (1073741824, "1.0 GB"),
        (1099511627776, "1.0 TB"),
        (5 * 1099511627776 + 1099511627776 // 2, "5.5 TB"),
        (2048 * 1099511627776, "2048.0 TB"),  # unbounded TB tail
        # numerator beyond 2^53 and not a power of two: double division
        # would floor across the boundary here; true long div must not
        (3 * 2**50 + 7, "3072.0 TB"),
        (2**53 + 987654321, "8192.0 TB"),
    ],
)
def test_format_size_units(spark, n, expected):
    from pdf_extractor_spark.functions.normalize import format_size

    out = (
        spark.range(1)
        .select(format_size(F.lit(n)).alias("s"))
        .collect()[0]["s"]
    )
    assert out == expected


def test_flatten_nested_collision_raises(spark):
    from pyspark.sql import Row as R

    df = spark.createDataFrame([(1, "x")], ["id", "meta.host"]).withColumn(
        "meta", F.struct(F.lit("y").alias("host"))
    )
    with pytest.raises(ValueError, match="collision"):
        flatten_nested(df)
