"""Document-outline extractor: nesting rule, tolerance, UDF identity."""

from __future__ import annotations

from pdf_extractor_spark.extract.outline import extract_outline_one


def _o(html: str):
    return extract_outline_one(html.encode("utf-8"))


def test_basic_nesting_and_sibling_pop():
    got = _o(
        "<h1>A</h1><p>x</p><h2>B</h2><h3>C</h3><h2>D</h2><h1>E</h1><h4>F</h4>"
    )
    assert got == [
        (0, 1, "A", ""),
        (1, 2, "B", "A"),
        (2, 3, "C", "A/B"),
        (3, 2, "D", "A"),  # sibling h2 pops B and C
        (4, 1, "E", ""),  # new h1 pops everything
        (5, 4, "F", "E"),  # level gaps allowed: h4 directly under h1
    ]


def test_inline_markup_and_entities_in_title():
    got = _o("<h2>Fast &amp; <em>loose</em> &#8212; ok</h2>")
    assert got == [(0, 2, "Fast & loose — ok", "")]


def test_unclosed_heading_flushes_at_eof_and_at_next_heading():
    assert _o("<h1>open ended") == [(0, 1, "open ended", "")]
    got = _o("<h1>first<h2>second</h2>")
    assert got == [(0, 1, "first", ""), (1, 2, "second", "first")]


def test_rawtext_bodies_never_leak_into_titles():
    got = _o("<h1>T<script>var h2 = '</h1>nope';</script>ail</h1>")
    assert got == [(0, 1, "Tail", "")]


def test_whitespace_normalized_and_empty_title_kept():
    got = _o("<h3>  lots \n\t of   space </h3><h4></h4>")
    assert got == [(0, 3, "lots of space", ""), (1, 4, "", "lots of space")]


def test_no_headings_yields_empty():
    assert _o("<p>just a paragraph</p>") == []
    assert _o("") == []


def test_udf_equals_pure_function(spark):
    """The Arrow UDF must be the identity wrapper over the pure parser,
    at more than one partitioning."""
    from pyspark.sql import functions as F

    from pdf_extractor_spark.extract.udfs import outline_udf

    pages = [
        (i, f"<h1>T{i % 3}</h1><h2>S&amp;{i % 2}</h2><h3>deep {i}</h3>".encode())
        for i in range(40)
    ]
    df = spark.createDataFrame(pages, "doc_id long, html binary")
    for parts in (1, 7):
        rows = (
            df.repartition(parts)
            .select("doc_id", F.explode(outline_udf("html")).alias("h"))
            .select("doc_id", "h.heading_idx", "h.level", "h.title", "h.path")
            .collect()
        )
        got = {}
        for r in rows:
            got.setdefault(r["doc_id"], []).append(
                (r["heading_idx"], r["level"], r["title"], r["path"])
            )
        for doc_id, html in pages:
            assert sorted(got[doc_id]) == extract_outline_one(html), doc_id
