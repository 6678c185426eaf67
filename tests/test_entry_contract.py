"""Driver-contract smoke tests: entry(), queries()/oracle_sql() pairing."""

from __future__ import annotations

import pytest

import __spark_entry__ as E


def test_queries_and_oracles_paired():
    q = E.queries()
    o = E.oracle_sql()
    assert len(q) >= 39
    # every oracle key must have a query; rows-only queries are allowed
    assert set(o) <= set(q)
    # current catalog: everything is oracle-checked
    assert set(o) == set(q)


def test_driver_window_first_50():
    """The driver grades CORRECTNESS for exactly the first 50 queries()
    entries. Pin the window: flagship extraction pipelines first, every
    never-driver-checked query inside, and no duplicates (VERDICT r2 item 1)."""
    from pdf_extractor_spark.queries import _DRIVER_WINDOW

    names = list(E.queries())
    assert len(_DRIVER_WINDOW) == 50
    assert len(set(_DRIVER_WINDOW)) == 50
    assert names[:50] == _DRIVER_WINDOW
    assert names[0] == "x_extract_pipeline"
    must_be_graded = {
        "x_extract_pipeline", "x_extract_spans", "x_extract_pdf_pipeline",
        "x_curation_pipeline", "m_pack_sequences", "m_chunk_for_training",
        "m3_reassemble_chunks", "p6_quick_validate", "a1_collect_note_refs",
        "e_kmeans_clusters", "e_ann_multiprobe", "e_ivf_multiprobe",
        "mm_image_features", "mm_audio_features", "mm_frame_sample",
        "t_stratified_sample", "t_quality_weighted_sample",
        "d_decontaminate", "d_dup_components", "d_cluster_representatives",
    }
    assert must_be_graded <= set(names[:50])
    # oracles, where present, follow the same order as queries
    o = list(E.oracle_sql())
    assert o == [n for n in names if n in set(o)]


def test_entry_runs_and_returns_rows(spark):
    df = E.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert set(df.columns) == {"doc_id", "extracted", "n_blocks", "ok"}


@pytest.mark.parametrize("name", ["q1_pricing_summary", "d_lsh_pairs", "x_extract_pipeline"])
def test_sample_queries_run_at_sf0001(spark, name):
    df = E.queries()[name](spark, "/root/testdata/sf0.001")
    assert df.count() >= 0  # materializes without error


def test_apply_corrections(spark):
    from pdf_extractor_spark.operators.merges import apply_corrections

    items = spark.createDataFrame(
        [
            ("u1", "Goodwill", {"2024-12-31": 4.38, "2023-12-31": 4.1}),
            ("u1", "Other", {"2024-12-31": 1.0}),
            ("u2", "Goodwill", {"2024-12-31": 9.9}),
        ],
        "url string, label string, values map<string,double>",
    )
    corrections = spark.createDataFrame(
        [("u1", " goodwill ", "2024-12-31", 4380000.0)],
        "url string, label string, period_key string, new_value double",
    )
    out = apply_corrections(items, corrections)
    got = {(r["url"], r["label"]): r["values"] for r in out.collect()}
    assert got[("u1", "Goodwill")]["2024-12-31"] == 4380000.0
    assert got[("u1", "Goodwill")]["2023-12-31"] == 4.1  # untouched
    assert got[("u1", "Other")]["2024-12-31"] == 1.0
    assert got[("u2", "Goodwill")]["2024-12-31"] == 9.9  # different doc untouched
