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
    # everything is oracle-checked except ops with no ANSI-SQL counterpart,
    # which are pytest-golden-gated instead (each one documented in its
    # query docstring) — keep this set EXPLICIT so a forgotten oracle fails
    rows_only = {"t_compression_ratio"}  # zlib DEFLATE: no DuckDB scalar
    assert set(q) - set(o) == rows_only


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
    # r4 rotation policy (VERDICT r3 item 1): every query that has no driver
    # CORRECTNESS row from a prior round must sit inside the graded window,
    # so the union of r1..r4 rows covers the whole catalog. Derive the
    # never-checked set from the committed CORRECTNESS files, not a pin.
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prior_rows: set[str] = set()
    for n in (1, 2, 3):
        path = os.path.join(repo, f"CORRECTNESS_r0{n}.json")
        if os.path.exists(path):
            with open(path) as fh:
                prior_rows |= set(json.load(fh))
    never_checked = {n for n in names if n not in prior_rows}
    # Queries added during round 4 register AFTER the window (they get their
    # driver rows in the r5 rotation); the window itself, anchor aside, must
    # spend every slot on a never-checked query, and every never-checked
    # query that predates the rotation must be inside it.
    wasted = set(_DRIVER_WINDOW) - never_checked - {"x_extract_pipeline"}
    assert not wasted, (
        f"window slots wasted on already-driver-checked queries: {sorted(wasted)}"
    )
    left_out = never_checked - set(_DRIVER_WINDOW)
    for n in sorted(left_out):
        # tolerated only for post-rotation registrations (appended after slot 50)
        assert names.index(n) >= 50, (
            f"never-driver-checked query {n!r} sits outside the graded window"
        )
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
