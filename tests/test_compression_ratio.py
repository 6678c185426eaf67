"""Compression-ratio quality screen: golden identity vs single-process zlib
(the DEFLATE op has no SQL oracle — this gate replaces it)."""

from __future__ import annotations

import zlib

from pdf_extractor_spark.operators.textstats import compression_stats


def _golden(text: str, level: int = 6) -> tuple[int, int, int]:
    raw = (text or "").encode("utf-8")
    comp = len(zlib.compress(raw, level))
    return len(raw), comp, (1000000 * comp) // len(raw) if raw else 0


def test_matches_single_process_zlib_at_two_parallelisms(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    texts = {r["doc_id"]: r["text"] for r in df.select("doc_id", "text").collect()}
    goldens = {i: _golden(t) for i, t in texts.items()}
    for n_part in (1, 8):
        got = {
            r["doc_id"]: (r["n_bytes"], r["n_compressed"], r["ratio_ppm"])
            for r in compression_stats(df, n_partitions=n_part).collect()
        }
        assert got == goldens


def test_signal_orders_repetitive_below_diverse(spark):
    rows = [
        ("loop", "buy now " * 400),
        ("prose", "A riverbank conversation drifted toward the economics of "
                  "salmon migration, touching tariffs, weather, and luck. " * 8),
        ("empty", ""),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["doc_id"]: r for r in compression_stats(df).collect()}
    assert got["loop"]["ratio_ppm"] < got["prose"]["ratio_ppm"]
    assert got["empty"]["ratio_ppm"] == 0 and got["empty"]["n_bytes"] == 0


def test_contract_query_keep_band(spark):
    from pdf_extractor_spark.queries import _QUERIES

    out = _QUERIES["t_compression_ratio"](spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert len(rows) == 500
    for r in rows:
        in_band = 300000 <= r["ratio_ppm"] <= 950000
        assert r["keep"] == in_band
