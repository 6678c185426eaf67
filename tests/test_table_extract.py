"""Golden + property tests for the HTML table-structure extractor
(pdf_extractor_spark/extract/tables.py): grid semantics (colspan/rowspan
occupancy, nested tables, malformed input), totality/determinism under
mutation, and Spark-UDF == single-process identity."""

from __future__ import annotations

import random

import pytest

from pdf_extractor_spark.extract.tables import extract_tables_one


GOLDEN_CASES = [
    # regular grid
    (
        "<table><tr><td>a</td><td>b</td></tr><tr><td>c</td><td>d</td></tr></table>",
        [(0, 0, 0, "a"), (0, 0, 1, "b"), (0, 1, 0, "c"), (0, 1, 1, "d")],
    ),
    # th cells, entity unescape, whitespace normalization
    (
        "<table><tr><th> H&amp;M </th></tr><tr><td>x\n y</td></tr></table>",
        [(0, 0, 0, "H&M"), (0, 1, 0, "x y")],
    ),
    # colspan shifts later cells in the same row
    (
        "<table><tr><td colspan=2>a</td><td>b</td></tr></table>",
        [(0, 0, 0, "a"), (0, 0, 2, "b")],
    ),
    # rowspan occupies its column in the NEXT row
    (
        '<table><tr><td rowspan="2">a</td><td>b</td></tr><tr><td>c</td></tr></table>',
        [(0, 0, 0, "a"), (0, 0, 1, "b"), (0, 1, 1, "c")],
    ),
    # rowspan=3 spans exactly two following rows, freed after
    (
        "<table><tr><td rowspan=3>a</td><td>b</td></tr><tr><td>c</td></tr>"
        "<tr><td>d</td></tr><tr><td>e</td></tr></table>",
        [(0, 0, 0, "a"), (0, 0, 1, "b"), (0, 1, 1, "c"), (0, 2, 1, "d"), (0, 3, 0, "e")],
    ),
    # rowspan+colspan rectangle
    (
        "<table><tr><td rowspan=2 colspan=2>a</td><td>b</td></tr><tr><td>c</td></tr></table>",
        [(0, 0, 0, "a"), (0, 0, 2, "b"), (0, 1, 2, "c")],
    ),
    # nested table: own table_idx (document order), text separated
    (
        "<table><tr><td>out <table><tr><td>in</td></tr></table> side</td></tr></table>",
        [(1, 0, 0, "in"), (0, 0, 0, "out side")],
    ),
    # implicit closes (HTML5 omitted </td>/</tr>)
    (
        "<table><tr><td>a<td>b<tr><td>c</table>",
        [(0, 0, 0, "a"), (0, 0, 1, "b"), (0, 1, 0, "c")],
    ),
    # <td> with no <tr> implies row 0
    ("<table><td>no-tr</td></table>", [(0, 0, 0, "no-tr")]),
    # unclosed at EOF still flushes
    ("<table><tr><td>dangling", [(0, 0, 0, "dangling")]),
    # raw-text bodies are skipped even when they contain table markup
    (
        '<table><tr><td>x<script>var t="<td>nope</td>"</script>y</td></tr></table>',
        [(0, 0, 0, "xy")],
    ),
    # sibling tables number in document order
    (
        "<table><tr><td>a</td></tr></table><p>t</p><table><tr><td>b</td></tr></table>",
        [(0, 0, 0, "a"), (1, 0, 0, "b")],
    ),
    # no tables -> no rows; stray cells outside any table are ignored
    ("<p>plain</p><td>stray</td>", []),
]


@pytest.mark.parametrize("html,want", GOLDEN_CASES)
def test_table_extract_goldens(html, want):
    assert extract_tables_one(html.encode()) == want


def test_mutation_totality_and_determinism():
    """Byte-level mutations must never raise and must stay deterministic
    (same discipline as the main-content parser's fuzz test)."""
    base = (
        "<table><tr><th>h1</th><th colspan=2>h2</th></tr>"
        '<tr><td rowspan="2">a</td><td>b &amp; c</td><td>d</td></tr>'
        "<tr><td>e</td><td><table><tr><td>n</td></tr></table></td></tr>"
        "</table>"
    ).encode()
    rng = random.Random(1234)
    for _ in range(300):
        b = bytearray(base)
        for _ in range(rng.randint(1, 6)):
            op = rng.randrange(3)
            i = rng.randrange(len(b))
            if op == 0:
                b[i] = rng.randrange(256)
            elif op == 1:
                del b[i]
            else:
                b.insert(i, rng.randrange(256))
        payload = bytes(b)
        r1 = extract_tables_one(payload)
        r2 = extract_tables_one(payload)
        assert r1 == r2
        for t, r, c, s in r1:
            assert t >= 0 and r >= 0 and c >= 0 and isinstance(s, str)


def test_udf_matches_single_process(spark):
    """The Arrow-batched UDF path must emit exactly the pure function's
    cells for every fixture page, at a multi-partition layout."""
    from pdf_extractor_spark.extract.udfs import table_cells_udf
    from pyspark.sql import functions as F

    pages = [h.encode() for h, _ in GOLDEN_CASES]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pages)], "id long, payload binary"
    ).repartition(5)
    got = {
        (r["id"], r["c"]["table_idx"], r["c"]["row_idx"], r["c"]["col_idx"],
         r["c"]["cell"])
        for r in df.select(
            "id", F.explode(table_cells_udf(F.col("payload"))).alias("c")
        ).collect()
    }
    want = {
        (i, t, r, c, s)
        for i, p in enumerate(pages)
        for t, r, c, s in extract_tables_one(p)
    }
    assert got == want
