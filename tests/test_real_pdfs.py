"""Real-world smoke: the reference repo's own example PDFs (read-only
oracles for realism — SURVEY.md §7). These are production documents: a
62-page report with partial 1-byte ToUnicode CMaps and a 67-page L'Oréal
filing with Identity-H CID fonts. The from-scratch parser must read both."""

from __future__ import annotations

import os

import pytest

from pdf_extractor_spark.extract.pdf_parser import extract_pdf_one

EXAMPLES = "/root/reference/examples"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(EXAMPLES), reason="reference examples not present"
)


def test_report_pdf_extracts_readable_text():
    payload = open(os.path.join(EXAMPLES, "2024-Financial-Report.pdf"), "rb").read()
    text, spans, n = extract_pdf_one(payload)
    assert n > 100 and len(text) > 50_000
    # recognizable content, correctly CMap-decoded (curly apostrophe)
    assert "Financial Statements" in text
    assert "Management’s Discussion" in text


def test_cid_font_pdf_extracts_readable_text():
    payload = open(
        os.path.join(EXAMPLES, "Consolidated financial statements.pdf"), "rb"
    ).read()
    text, spans, n = extract_pdf_one(payload)
    assert n > 100 and len(text) > 50_000
    # Identity-H CID text decoded through /ToUnicode (accented chars intact)
    assert "L’Oréal" in text
    assert "Consolidated" in text


def test_real_pdfs_deterministic():
    payload = open(os.path.join(EXAMPLES, "2024-Financial-Report.pdf"), "rb").read()
    assert extract_pdf_one(payload) == extract_pdf_one(payload)
