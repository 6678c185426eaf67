"""Axis-aligned rotated-page support (VERDICT r3 item 4).

90/180/270-degree-rotated text is routine in scanned financial statements —
the reference's own domain (/root/reference/examples class documents; the
reference never sees layout at all, its extraction being a remote LLM call,
so rotation parity is defined against the upright parse). The parser tracks
the full line matrix, classes each run by quarter-turn, and remaps each class
into reading space before clustering, so extraction output is INVARIANT in
the page rotation.
"""

from __future__ import annotations

import random

import pytest

from pdf_extractor_spark.extract.pdf_parser import extract_pdf_one
from pdf_extractor_spark.fixtures.synth import make_pdf


def _body_runs(lines: list[str], x: float = 72.0, y0: float = 700.0, dy: float = 14.0):
    return [(x, y0 - i * dy, s) for i, s in enumerate(lines)]


_PARA = _body_runs(["para one line a", "para one line b"]) + [
    (72.0, 700.0 - 14 * 4, "para two line a"),
    (72.0, 700.0 - 14 * 5, "para two line b"),
]


@pytest.mark.parametrize("rot", [1, 2, 3])
def test_rotation_invariant_single_column(rot):
    upright = extract_pdf_one(make_pdf([_PARA]))
    rotated = extract_pdf_one(make_pdf([_PARA], rotate=rot))
    assert rotated == upright
    assert upright[0].startswith("para one line a")


@pytest.mark.parametrize("rot", [1, 2, 3])
def test_rotation_invariant_two_columns_and_margins(rot):
    left = [(72.0, 700.0 - 14 * i, f"left column line {i} padded out wide") for i in range(6)]
    right = [(330.0, 700.0 - 14 * i, f"right column line {i} padded out wide") for i in range(6)]
    hdr = [(72.0, 762.0, "RUNNING HEADER"), (72.0, 25.0, "page 7 footer")]
    pages = [hdr + left + right]
    upright = extract_pdf_one(make_pdf(pages))
    rotated = extract_pdf_one(make_pdf(pages, rotate=rot))
    assert rotated == upright
    assert "RUNNING HEADER" not in upright[0]  # margin band still applies rotated
    assert "footer" not in upright[0]
    assert len(upright[0].split("\n\n")) == 2  # column split on the swapped box


@pytest.mark.parametrize("rot", [1, 2, 3])
def test_rotation_invariant_shuffled_stream_order(rot):
    lines = [f"line number {i} with padding text" for i in range(8)]
    runs = _body_runs(lines)
    upright = extract_pdf_one(make_pdf([runs]))[0]
    rotated = extract_pdf_one(
        make_pdf([runs], rotate=rot, shuffle_runs_rng=random.Random(7))
    )[0]
    assert rotated == upright


def test_mixed_rotation_classes_on_one_page():
    """An upright body plus a 90-degree-rotated sidebar stamp: each class
    clusters in its own reading space; upright text emits first (class
    order 0,1,2,3 — deterministic, partitioning-independent)."""
    body = b"BT\n/F1 11 Tf\n1 0 0 1 72 700 Tm\n(upright body text) Tj\n"
    # device (560, 300), 90 deg CCW: reading y = dev_w - 560 = 52 (in-band
    # for the swapped 792x612 reading box), reading x = 300
    stamp = b"0 1 -1 0 560 300 Tm\n(ROTATED STAMP) Tj\nET"
    content = body + stamp
    objs = {
        1: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding /WinAnsiEncoding >>",
        2: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content),
        3: b"<< /Type /Page /Parent 4 0 R /MediaBox [0 0 612 792] "
        b"/Contents 2 0 R /Resources << /Font << /F1 1 0 R >> >> >>",
        4: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        5: b"<< /Type /Catalog /Pages 4 0 R >>",
    }
    from tests.test_pdf_extract import _classic_objs

    text, _, n = extract_pdf_one(_classic_objs(objs))
    assert text == "upright body text\n\nROTATED STAMP"
    assert n == 2


def test_td_displacement_goes_through_matrix():
    """Td/T* units are TEXT space (PDF 32000-1 9.4.2): under a 90-degree
    matrix a Td line advance moves along device +x, so consecutive lines
    still come out in reading order."""
    content = (
        b"BT\n/F1 11 Tf\n14 TL\n0 1 -1 0 520 200 Tm\n"
        b"(first rotated line) Tj\nT*\n(second rotated line) Tj\n"
        b"0 -14 Td\n(third rotated line) Tj\nET"
    )
    objs = {
        1: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding /WinAnsiEncoding >>",
        2: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content),
        3: b"<< /Type /Page /Parent 4 0 R /MediaBox [0 0 612 792] "
        b"/Contents 2 0 R /Resources << /Font << /F1 1 0 R >> >> >>",
        4: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        5: b"<< /Type /Catalog /Pages 4 0 R >>",
    }
    from tests.test_pdf_extract import _classic_objs

    text, _, _ = extract_pdf_one(_classic_objs(objs))
    assert text.split("\n") == [
        "first rotated line",
        "second rotated line",
        "third rotated line",
    ]


def test_scaled_tm_keeps_upright_class_and_spec_td():
    """A pure-scale Tm (a=d=12, the font-size-as-scale idiom) stays class 0;
    Td afterwards is scaled by the matrix per spec (12 * 1.2 = 14.4 units)."""
    content = (
        b"BT\n/F1 1 Tf\n12 0 0 12 72 700 Tm\n(scaled line one) Tj\n"
        b"0 -1.2 Td\n(scaled line two) Tj\nET"
    )
    objs = {
        1: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding /WinAnsiEncoding >>",
        2: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content),
        3: b"<< /Type /Page /Parent 4 0 R /MediaBox [0 0 612 792] "
        b"/Contents 2 0 R /Resources << /Font << /F1 1 0 R >> >> >>",
        4: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        5: b"<< /Type /Catalog /Pages 4 0 R >>",
    }
    from tests.test_pdf_extract import _classic_objs

    text, _, _ = extract_pdf_one(_classic_objs(objs))
    # 14.4 > LINE_Y_TOL: two distinct lines, reading order preserved
    assert text.split("\n") == ["scaled line one", "scaled line two"]


def test_rotated_pages_byte_identical_at_two_parallelisms(spark):
    """The verdict's done-criterion: synthesized rotated-page fixtures are
    byte-identical through the distributed UDF at two parallelism levels,
    and equal to the pure function."""
    from pdf_extractor_spark.extract.udfs import extract_one
    from pdf_extractor_spark.pipeline import extract_documents

    payloads = [make_pdf([_PARA], rotate=r) for r in range(4)]
    goldens = {i: extract_one(p)[0] for i, p in enumerate(payloads)}
    assert len(set(goldens.values())) == 1  # rotation-invariant
    assert all(goldens.values())
    rows = [(f"https://h/{i}", p) for i, p in enumerate(payloads)]
    df = spark.createDataFrame(rows, "url string, html binary")
    for n_part in (1, 4):
        got = {
            int(r["url"].rsplit("/", 1)[1]): r["text"]
            for r in extract_documents(df, n_partitions=n_part).collect()
        }
        assert got == goldens
