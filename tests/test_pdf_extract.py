"""Unit tests for the from-scratch PDF layout parser."""

from __future__ import annotations

import random

import pytest

from pdf_extractor_spark.extract.pdf_parser import extract_pdf_one
from pdf_extractor_spark.fixtures.synth import make_pdf, make_pdf_payload

H = 792.0


def _body_runs(lines: list[str], x: float = 72.0, y0: float = 700.0, dy: float = 14.0):
    return [(x, y0 - i * dy, s) for i, s in enumerate(lines)]


def test_single_column_reading_order():
    runs = _body_runs(["first line of text", "second line of text", "third line of text"])
    text, spans, n = extract_pdf_one(make_pdf([runs]))
    assert text == "first line of text\nsecond line of text\nthird line of text"
    assert n == 1


def test_paragraph_gap_splits_blocks():
    runs = _body_runs(["para one line a", "para one line b"]) + [
        (72.0, 700.0 - 14 * 4, "para two line a"),
        (72.0, 700.0 - 14 * 5, "para two line b"),
    ]
    text, _, n = extract_pdf_one(make_pdf([runs]))
    assert n == 2
    assert text == "para one line a\npara one line b\n\npara two line a\npara two line b"


def test_shuffled_stream_order_restored():
    lines = [f"line number {i} with padding text" for i in range(8)]
    runs = _body_runs(lines)
    ordered = extract_pdf_one(make_pdf([runs]))[0]
    shuffled = extract_pdf_one(
        make_pdf([runs], shuffle_runs_rng=random.Random(123))
    )[0]
    assert ordered == shuffled
    assert ordered.replace("\n\n", "\n").split("\n") == lines


def test_two_column_reading_order():
    left = [(72.0, 700.0 - 14 * i, f"left column line {i} padded out wide") for i in range(6)]
    right = [(330.0, 700.0 - 14 * i, f"right column line {i} padded out wide") for i in range(6)]
    text, _, n = extract_pdf_one(make_pdf([left + right]))
    body = text.split("\n\n")
    assert len(body) == 2
    assert all("left" in ln for ln in body[0].split("\n"))
    assert all("right" in ln for ln in body[1].split("\n"))


def test_header_footer_excluded():
    runs = [(72.0, H - 30, "HEADER TEXT"), (72.0, 25.0, "FOOTER TEXT")] + _body_runs(
        ["real body content line one", "real body content line two"]
    )
    text, _, _ = extract_pdf_one(make_pdf([runs]))
    assert "HEADER" not in text and "FOOTER" not in text
    assert "real body content" in text


def test_table_cells_join_left_to_right():
    runs = [
        (72.0, 700.0, "Row 1"), (220.0, 700.0, "10"), (320.0, 700.0, "20"),
        (72.0, 686.0, "Row 2"), (220.0, 686.0, "30"), (320.0, 686.0, "40"),
    ]
    text, _, _ = extract_pdf_one(make_pdf([runs]))
    assert "Row 1 10 20" in text and "Row 2 30 40" in text


def test_multi_page_order():
    p1 = _body_runs(["page one content line alpha"])
    p2 = _body_runs(["page two content line beta"])
    text, _, _ = extract_pdf_one(make_pdf([p1, p2]))
    assert text.index("page one") < text.index("page two")


def test_uncompressed_stream():
    runs = _body_runs(["uncompressed stream body line"])
    text, _, _ = extract_pdf_one(make_pdf([runs], compress=False))
    assert text == "uncompressed stream body line"


def test_escapes_and_parens():
    runs = _body_runs([r"parens () and backslash \ inside"])
    text, _, _ = extract_pdf_one(make_pdf([runs]))
    assert "parens () and backslash \\ inside" in text


def test_latin1_text():
    runs = _body_runs(["café naïve über señal"])
    text, _, _ = extract_pdf_one(make_pdf([runs]))
    assert "café naïve über señal" in text


def test_garbage_payload_no_crash():
    assert extract_pdf_one(b"%PDF-1.4 garbage") == ("", [], 0)


def test_fixture_corpus_deterministic_and_margin_clean():
    for doc_id in range(0, 40):
        payload = make_pdf_payload(doc_id)
        r1 = extract_pdf_one(payload)
        r2 = extract_pdf_one(payload)
        assert r1 == r2
        assert "Annual Report" not in r1[0]
        assert "Page 1" not in r1[0]
        if doc_id % 5 != 2:  # table pages can be short
            assert len(r1[0]) > 50


def test_objstm_page_and_font_dicts_are_surfaced():
    """PDF 1.5 object streams: page/font dictionaries compressed inside a
    /Type /ObjStm must be found (else extraction falls back to the
    no-MediaBox path and the margin band / fonts are lost)."""
    import zlib

    from pdf_extractor_spark.extract.pdf_parser import extract_pdf_one

    content_raw = (
        b"BT\n/F1 11 Tf\n"
        b"1 0 0 1 72 762 Tm\n(HEADER LINE) Tj\n"        # inside margin band
        b"1 0 0 1 72 400 Tm\n(Hello ObjStm world) Tj\n"  # body
        b"ET"
    )
    content = zlib.compress(content_raw)
    font_body = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding /WinAnsiEncoding >>"
    )
    page_body = (
        b"<< /Type /Page /MediaBox [0 0 612 792] /Contents 2 0 R "
        b"/Resources << /Font << /F1 4 0 R >> >> >>"
    )
    header = b"4 0 5 %d " % (len(font_body) + 1)
    stm_data = header + font_body + b"\n" + page_body
    stm = zlib.compress(stm_data)

    def obj(num, body):
        return b"%d 0 obj\n%s\nendobj\n" % (num, body)

    objstm_pdf = (
        b"%PDF-1.5\n"
        + obj(
            1,
            b"<< /Type /ObjStm /N 2 /First %d /Filter /FlateDecode /Length %d >>\n"
            b"stream\n%s\nendstream" % (len(header), len(stm), stm),
        )
        + obj(
            2,
            b"<< /Filter /FlateDecode /Length %d >>\nstream\n%s\nendstream"
            % (len(content), content),
        )
        + b"%%EOF\n"
    )
    classic_pdf = (
        b"%PDF-1.4\n"
        + obj(4, font_body)
        + obj(5, page_body)
        + obj(
            2,
            b"<< /Filter /FlateDecode /Length %d >>\nstream\n%s\nendstream"
            % (len(content), content),
        )
        + b"%%EOF\n"
    )
    got_objstm = extract_pdf_one(objstm_pdf)
    got_classic = extract_pdf_one(classic_pdf)
    assert got_objstm[0] == got_classic[0] == "Hello ObjStm world"
    assert "HEADER" not in got_objstm[0]  # MediaBox known -> margin band applied


# --- robustness: synthesized edge cases beyond the reference examples --------


def _classic_objs(objs: dict[int, bytes]) -> bytes:
    """Assemble numbered objects + classic xref table into a PDF file."""
    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_pos = len(out)
    top = max(objs) + 1
    out += b"xref\n0 %d\n0000000000 65535 f \n" % top
    for num in sorted(objs):
        out += b"%010d 00000 n \n" % offsets[num]
    out += b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n" % (
        top,
        max(objs),
        xref_pos,
    )
    return bytes(out)


def test_hex_strings_in_tj_arrays():
    """<...> hex strings mixed with literal strings and kerning numbers
    inside one TJ array must decode and concatenate in order."""
    content = (
        b"BT\n/F1 11 Tf\n1 0 0 1 72 700 Tm\n"
        b"[(Quarterly ) -250 <7265> 30 <76656E7565> -250 ( rose sharply)] TJ\n"
        b"1 0 0 1 72 686 Tm\n"
        b"[<48657820 6C696E65> ( and literal tail)] TJ\nET"
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
    text, spans, n = extract_pdf_one(_classic_objs(objs))
    assert "Quarterly revenue rose sharply" in text
    # odd-length hex (<...0> padded) and whitespace inside hex both legal
    assert "Hex line and literal tail" in text
    assert n >= 1 and len(spans) == n


def _two_objstm_chain_pdf() -> bytes:
    """Objects spread across TWO /ObjStm streams plus a chained pair of
    xref STREAMS (/Prev) — the PDF 1.5 layout where no classic xref table
    exists and the document's dictionaries live inside object streams."""
    import zlib as _z

    content = (
        b"BT\n/F1 11 Tf\n1 0 0 1 72 700 Tm\n(Chained object streams work) Tj\nET"
    )

    def objstm(num_first: list[tuple[int, bytes]]) -> bytes:
        bodies = b""
        pairs = b""
        for onum, body in num_first:
            pairs += b"%d %d " % (onum, len(bodies))
            bodies += body + b"\n"
        first = len(pairs)
        data = _z.compress(pairs + bodies)
        return (
            b"<< /Type /ObjStm /N %d /First %d /Filter /FlateDecode /Length %d >>\n"
            b"stream\n%s\nendstream" % (len(num_first), first, len(data), data)
        )

    def xref_stream(size: int, prev: int | None) -> bytes:
        # minimal /Type /XRef stream: 1 dummy entry, chained via /Prev
        data = _z.compress(b"\x01\x00\x00\x00")
        prev_part = b"/Prev %d " % prev if prev is not None else b""
        return (
            b"<< /Type /XRef /Size %d %s/W [1 2 1] /Index [0 1] "
            b"/Root 7 0 R /Filter /FlateDecode /Length %d >>\n"
            b"stream\n%s\nendstream" % (size, prev_part, len(data), data)
        )

    objs: dict[int, bytes] = {}
    # stream objects must live OUTSIDE any ObjStm (spec 7.5.7)
    objs[2] = b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content)
    # ObjStm #1: the font and page dicts
    objs[10] = objstm(
        [
            (1, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
                b"/Encoding /WinAnsiEncoding >>"),
            (3, b"<< /Type /Page /Parent 6 0 R /MediaBox [0 0 612 792] "
                b"/Contents 2 0 R /Resources << /Font << /F1 1 0 R >> >> >>"),
        ]
    )
    # ObjStm #2: the page tree and catalog
    objs[11] = objstm(
        [
            (6, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
            (7, b"<< /Type /Catalog /Pages 6 0 R >>"),
        ]
    )
    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    # chained xref streams: 20 points back to 21 via /Prev
    first_xref_pos = len(out)
    out += b"21 0 obj\n" + xref_stream(22, None) + b"\nendobj\n"
    second_xref_pos = len(out)
    out += b"20 0 obj\n" + xref_stream(22, first_xref_pos) + b"\nendobj\n"
    out += b"startxref\n%d\n%%%%EOF\n" % second_xref_pos
    return bytes(out)


def test_multi_objstm_xref_chain():
    """Dictionaries split across two object streams + chained xref streams
    (no classic xref table at all) must still extract."""
    text, spans, n = extract_pdf_one(_two_objstm_chain_pdf())
    assert text == "Chained object streams work"
    assert n == 1


def test_edge_case_pdfs_byte_identical_at_two_parallelisms(spark):
    """Golden protocol at two parallelism levels for the new edge cases:
    the distributed UDF must equal the pure function, partitioning-proof."""
    from pdf_extractor_spark.extract.udfs import extract_one
    from pdf_extractor_spark.pipeline import extract_documents

    hex_content = (
        b"BT\n/F1 11 Tf\n1 0 0 1 72 700 Tm\n[<4865> -250 (llo) ( mixed)] TJ\nET"
    )
    hexpdf_objs = {
        1: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding /WinAnsiEncoding >>",
        2: b"<< /Length %d >>\nstream\n%s\nendstream"
        % (len(hex_content), hex_content),
        3: b"<< /Type /Page /Parent 4 0 R /MediaBox [0 0 612 792] "
        b"/Contents 2 0 R /Resources << /Font << /F1 1 0 R >> >> >>",
        4: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        5: b"<< /Type /Catalog /Pages 4 0 R >>",
    }
    payloads = [
        _classic_objs(hexpdf_objs),
        _two_objstm_chain_pdf(),
        _incremental_update_pdf(),
    ]
    goldens = {i: extract_one(p)[0] for i, p in enumerate(payloads)}
    assert all(goldens.values())
    rows = [(f"https://h/{i}", p) for i, p in enumerate(payloads)]
    df = spark.createDataFrame(rows, "url string, html binary")
    for n_part in (1, 4):
        got = {
            int(r["url"].rsplit("/", 1)[1]): r["text"]
            for r in extract_documents(df, n_partitions=n_part)
            .select("url", "text")
            .collect()
        }
        assert got == goldens, n_part


def _png_predict_encode(raw: bytes, cols: int, ft: int) -> bytes:
    """Forward-apply a PNG row predictor (filter type ft on every row)."""
    out = bytearray()
    prev = bytearray(cols)
    for r0 in range(0, len(raw), cols):
        row = bytearray(raw[r0 : r0 + cols].ljust(cols, b"\x20"))
        enc = bytearray(row)
        if ft == 1:  # Sub
            for j in range(len(row) - 1, 0, -1):
                enc[j] = (row[j] - row[j - 1]) & 0xFF
        elif ft == 2:  # Up
            for j in range(len(row)):
                enc[j] = (row[j] - prev[j]) & 0xFF
        elif ft == 4:  # Paeth (bpp=1)
            for j in range(len(row)):
                a = row[j - 1] if j >= 1 else 0
                b = prev[j]
                c = prev[j - 1] if j >= 1 else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred_v = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[j] = (row[j] - pred_v) & 0xFF
        out += bytes([ft]) + enc
        prev = row
    return bytes(out)


def _predictor_pdf(ft: int, predictor: int, cols: int = 24) -> bytes:
    """PDF whose content stream is FlateDecode + /Predictor post-filtered."""
    import zlib as _z

    content = (
        b"BT\n/F1 11 Tf\n1 0 0 1 72 700 Tm\n(Predictor stream decoded) Tj\nET"
    )
    padded = content.ljust(((len(content) + cols - 1) // cols) * cols, b"\x20")
    if predictor == 2:  # TIFF horizontal differencing
        enc = bytearray(padded)
        for r0 in range(0, len(enc), cols):
            for j in range(r0 + cols - 1, r0, -1):
                enc[j] = (enc[j] - enc[j - 1]) & 0xFF
        data = _z.compress(bytes(enc))
    else:
        data = _z.compress(_png_predict_encode(padded, cols, ft))
    objs = {
        1: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding /WinAnsiEncoding >>",
        2: b"<< /Filter /FlateDecode /DecodeParms << /Predictor %d /Columns %d >> "
        b"/Length %d >>\nstream\n%s\nendstream" % (predictor, cols, len(data), data),
        3: b"<< /Type /Page /Parent 4 0 R /MediaBox [0 0 612 792] "
        b"/Contents 2 0 R /Resources << /Font << /F1 1 0 R >> >> >>",
        4: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        5: b"<< /Type /Catalog /Pages 4 0 R >>",
    }
    return _classic_objs(objs)


@pytest.mark.parametrize(
    "ft,predictor",
    [(0, 10), (1, 11), (2, 12), (4, 14), (0, 2)],  # 2 = TIFF; rest PNG
)
def test_predictor_filtered_content_streams(ft, predictor):
    text, spans, n = extract_pdf_one(_predictor_pdf(ft, predictor))
    assert text == "Predictor stream decoded"
    assert n == 1


def _filtered_pdf(filter_decl: bytes, encoded: bytes) -> bytes:
    objs = {
        1: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding /WinAnsiEncoding >>",
        2: b"<< /Filter %s /Length %d >>\nstream\n%s\nendstream"
        % (filter_decl, len(encoded), encoded),
        3: b"<< /Type /Page /Parent 4 0 R /MediaBox [0 0 612 792] "
        b"/Contents 2 0 R /Resources << /Font << /F1 1 0 R >> >> >>",
        4: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        5: b"<< /Type /Catalog /Pages 4 0 R >>",
    }
    return _classic_objs(objs)


_FILTER_CONTENT = b"BT\n/F1 11 Tf\n1 0 0 1 72 700 Tm\n(Filtered stream text) Tj\nET"


def _lzw_encode(raw: bytes) -> bytes:
    """Byte-at-a-time PDF LZW encoder (valid, uncompressing): clear, each
    byte as its own code, EOD — with decoder-synchronized early width
    growth (the decoder adds a table entry per code after the first)."""
    bits = []

    def emit(code: int, width: int) -> None:
        bits.extend((code >> (width - 1 - i)) & 1 for i in range(width))

    width, size, prev = 9, 258, False
    emit(256, width)  # clear
    for b in raw:
        emit(b, width)
        if prev:
            size += 1
        prev = True
        if size >= (1 << width) - 1 and width < 12:
            width += 1
    emit(257, width)  # EOD
    while len(bits) % 8:
        bits.append(0)
    return bytes(
        sum(bit << (7 - j) for j, bit in enumerate(bits[i : i + 8]))
        for i in range(0, len(bits), 8)
    )


@pytest.mark.parametrize(
    "decl,encode",
    [
        (b"/ASCIIHexDecode", lambda raw: raw.hex().encode() + b">"),
        (
            b"/ASCII85Decode",
            lambda raw: __import__("base64").a85encode(raw) + b"~>",
        ),
        (
            b"/RunLengthDecode",
            lambda raw: b"".join(
                bytes([len(raw[i : i + 127]) - 1]) + raw[i : i + 127]
                for i in range(0, len(raw), 127)
            )
            + b"\x80",
        ),
        (b"/LZWDecode", _lzw_encode),
        (
            b"[/ASCII85Decode /FlateDecode]",
            lambda raw: __import__("base64").a85encode(
                __import__("zlib").compress(raw)
            )
            + b"~>",
        ),
    ],
    ids=["ahx", "a85", "rle", "lzw", "chain-a85-flate"],
)
def test_stream_filters_decode(decl, encode):
    payload = _filtered_pdf(decl, encode(_FILTER_CONTENT))
    text, spans, n = extract_pdf_one(payload)
    assert text == "Filtered stream text"
    assert n == 1


def test_image_filter_streams_are_skipped_not_fatal():
    """A DCTDecode (JPEG) stream must not break extraction of the rest."""
    import zlib as _z

    content = b"BT\n/F1 11 Tf\n1 0 0 1 72 700 Tm\n(Real text) Tj\nET"
    data = _z.compress(content)
    objs = {
        1: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding /WinAnsiEncoding >>",
        2: b"<< /Filter /FlateDecode /Length %d >>\nstream\n%s\nendstream"
        % (len(data), data),
        3: b"<< /Type /Page /Parent 4 0 R /MediaBox [0 0 612 792] "
        b"/Contents 2 0 R /Resources << /Font << /F1 1 0 R >> "
        b"/XObject << /Im1 6 0 R >> >> >>",
        4: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        5: b"<< /Type /Catalog /Pages 4 0 R >>",
        6: b"<< /Subtype /Image /Filter /DCTDecode /Length 8 >>\n"
        b"stream\n\xff\xd8\xff\xe0fake\nendstream",
    }
    text, spans, n = extract_pdf_one(_classic_objs(objs))
    assert text == "Real text"


def test_inline_image_skipped_not_parsed_as_text():
    """BI ... ID <raw binary> EI inline images must be skipped wholesale —
    the binary payload contains parens/brackets/letters that would
    otherwise become phantom text runs or corrupt operator state."""
    binary = bytes(range(256)) + b"(fake string) [9 9] Tj BT"
    content = (
        b"BT\n/F1 11 Tf\n1 0 0 1 72 700 Tm\n(Before image) Tj\nET\n"
        b"BI /W 8 /H 8 /BPC 8 /CS /RGB ID " + binary + b" EI\n"
        b"BT\n/F1 11 Tf\n1 0 0 1 72 686 Tm\n(After image) Tj\nET"
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
    text, spans, n = extract_pdf_one(_classic_objs(objs))
    assert "Before image" in text and "After image" in text
    assert "fake string" not in text


def test_encoding_differences_remap():
    """Simple fonts with /Encoding /Differences: remapped codes decode to
    their glyph names' unicode, unmapped codes stay WinAnsi."""
    content = (
        b"BT\n/F1 11 Tf\n1 0 0 1 72 700 Tm\n"
        b"(caf\x80 d\x81j\x81 vu \x82 A-Z intact) Tj\nET"
    )
    objs = {
        1: b"<< /Type /Font /Subtype /Type1 /BaseFont /Custom "
        b"/Encoding << /Differences [ 128 /eacute /egrave /emdash ] >> >>",
        2: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content),
        3: b"<< /Type /Page /Parent 4 0 R /MediaBox [0 0 612 792] "
        b"/Contents 2 0 R /Resources << /Font << /F1 1 0 R >> >> >>",
        4: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        5: b"<< /Type /Catalog /Pages 4 0 R >>",
    }
    text, spans, n = extract_pdf_one(_classic_objs(objs))
    assert "café dèjè vu — A-Z intact" in text

    # indirect /Encoding object + uniXXXX names
    objs6 = dict(objs)
    objs6[1] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Custom /Encoding 6 0 R >>"
    )
    objs6[6] = b"<< /Type /Encoding /Differences [ 128 /uni20AC ] >>"
    content2 = b"BT\n/F1 11 Tf\n1 0 0 1 72 700 Tm\n(price \x80 ninety nine) Tj\nET"
    objs6[2] = b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content2), content2)
    text2, _, _ = extract_pdf_one(_classic_objs(objs6))
    assert "price € ninety nine" in text2


def test_inline_image_with_fake_ei_in_binary():
    """Raw image bytes containing a whitespace-delimited 'EI' by chance must
    NOT end the inline image early: resuming mid-image used to emit garbage
    text from stray '(...)' sequences in image data. A candidate EI is only
    accepted when the following bytes parse as a real stream continuation."""
    # fake EI followed by binary garbage (not a plausible operator), then a
    # paren run that would leak as phantom text if tokenization resumed here
    binary = (
        b"\x89\x50\x4e\x47 EI \xde\xad\xbe\xef(leaked garbage) Tj \xff\xfe"
        + bytes(range(200, 256))
    )
    content = (
        b"BT\n/F1 11 Tf\n1 0 0 1 72 700 Tm\n(Before image) Tj\nET\n"
        b"BI /W 4 /H 4 /BPC 8 /CS /RGB ID " + binary + b" EI\n"
        b"BT\n/F1 11 Tf\n1 0 0 1 72 686 Tm\n(After image) Tj\nET"
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
    text, spans, n = extract_pdf_one(_classic_objs(objs))
    assert "Before image" in text and "After image" in text
    assert "leaked garbage" not in text


def test_inline_image_dict_string_with_ei_not_terminator():
    """The EI scan must start AFTER the ID operator — only bytes following
    ID are image data."""
    content = (
        b"BI /W 2 /H 2 /BPC 8 /CS /G ID \x01\x02\x03\x04 EI\n"
        b"BT\n/F1 11 Tf\n1 0 0 1 72 700 Tm\n(Visible) Tj\nET"
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
    text, spans, n = extract_pdf_one(_classic_objs(objs))
    assert text == "Visible"


def _incremental_update_pdf() -> bytes:
    """PDF 1.5 incremental update resolved ONLY through the xref-stream
    chain: the original page object sits uncompressed in the base body,
    while the update stores the NEW page generation inside an ObjStm and
    appends an xref stream whose /Prev chains to the base section's xref
    stream. A brute object scan alone resolves the STALE page."""
    import zlib as _z

    def obj(num: int, body: bytes) -> bytes:
        return b"%d 0 obj\n%s\nendobj\n" % (num, body)

    def stream_obj(num: int, extra: bytes, payload: bytes) -> bytes:
        return obj(
            num,
            b"<< %s/Length %d >>\nstream\n%s\nendstream"
            % (extra, len(payload), payload),
        )

    def content(txt: bytes) -> bytes:
        return b"BT\n/F1 11 Tf\n1 0 0 1 72 700 Tm\n(%s) Tj\nET" % txt

    def xref_stream_obj(
        num: int, entries: list[tuple[int, int, int, int]], prev: int | None
    ) -> bytes:
        # entries: (obj_num, type, f2, f3); /W [1 2 1]
        entries = sorted(entries)
        index = b" ".join(b"%d 1" % e[0] for e in entries)
        raw = b"".join(
            bytes([t]) + f2.to_bytes(2, "big") + bytes([f3])
            for _n, t, f2, f3 in entries
        )
        data = _z.compress(raw)
        prev_part = b"/Prev %d " % prev if prev is not None else b""
        return stream_obj(
            num,
            b"/Type /XRef /Size 32 %s/W [1 2 1] /Index [%s] /Root 5 0 R "
            b"/Filter /FlateDecode " % (prev_part, index),
            data,
        )

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}

    def add(num: int, body: bytes) -> None:
        offsets[num] = len(out)
        out.extend(body)

    # --- base document ------------------------------------------------------
    add(1, obj(1, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
                  b"/Encoding /WinAnsiEncoding >>"))
    add(2, stream_obj(2, b"", content(b"Original text body")))
    add(3, obj(3, b"<< /Type /Page /Parent 4 0 R /MediaBox [0 0 612 792] "
                  b"/Contents 2 0 R /Resources << /Font << /F1 1 0 R >> >> >>"))
    add(4, obj(4, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"))
    add(5, obj(5, b"<< /Type /Catalog /Pages 4 0 R >>"))
    add(8, xref_stream_obj(
        8, [(n, 1, offsets[n], 0) for n in (1, 2, 3, 4, 5)], None
    ))
    out.extend(b"startxref\n%d\n%%%%EOF\n" % offsets[8])

    # --- incremental update: new page generation lives in an ObjStm ---------
    add(6, stream_obj(6, b"", content(b"Updated text body")))
    new_page = (
        b"<< /Type /Page /Parent 4 0 R /MediaBox [0 0 612 792] "
        b"/Contents 6 0 R /Resources << /Font << /F1 1 0 R >> >> >>"
    )
    pairs = b"3 0 "
    stm = _z.compress(pairs + new_page)
    add(10, stream_obj(
        10,
        b"/Type /ObjStm /N 1 /First %d /Filter /FlateDecode " % len(pairs),
        stm,
    ))
    add(9, xref_stream_obj(
        9,
        [(3, 2, 10, 0), (6, 1, offsets[6], 0), (10, 1, offsets[10], 0)],
        offsets[8],
    ))
    out.extend(b"startxref\n%d\n%%%%EOF\n" % offsets[9])
    return bytes(out)


def test_xref_stream_incremental_update_resolves_new_generation():
    """The xref-stream chain must override the brute scan: the updated page
    (inside an ObjStm, referenced by the newest xref section) wins over the
    stale uncompressed page from the base body."""
    from pdf_extractor_spark.extract.pdf_parser import (
        _expand_object_streams,
        _parse_objects,
        _xref_live_entries,
    )

    payload = _incremental_update_pdf()
    # the brute scan alone resolves the STALE generation (direct obj 3)
    scanned = _expand_object_streams(_parse_objects(payload))
    assert b"/Contents 2 0 R" in scanned[3][0]
    # the xref chain sees the update: obj 3 is member 0 of ObjStm 10
    live = _xref_live_entries(payload)
    assert live[3] == (2, 10, 0)
    assert live[2][0] == 1  # base-section entry survives via /Prev

    text, spans, n = extract_pdf_one(payload)
    assert text == "Updated text body"
    assert n == 1


def test_xref_stream_corrupt_chain_falls_back_to_scan():
    """A startxref pointing at garbage must not break extraction — the
    brute scan stays the robust base for truncated/dirty crawl payloads."""
    payload = _incremental_update_pdf()
    # corrupt the last startxref offset
    broken = payload.replace(
        b"startxref\n%d" % payload.rfind(b"9 0 obj"), b"startxref\n999999"
    )
    text, spans, n = extract_pdf_one(broken)
    assert "text body" in text  # still extracts (stale generation is fine)


def test_encrypted_pdf_raises_and_maps_to_error_row():
    """A PDF declaring /Encrypt must not emit ciphertext garbage as text:
    the parser raises EncryptedPdfError and the dispatch UDF converts it
    to an ok=false error row (the M2 path)."""
    from pdf_extractor_spark.extract.pdf_parser import (
        EncryptedPdfError,
        extract_pdf_one,
    )
    from pdf_extractor_spark.extract.udfs import extract_one

    plain = make_pdf([[(72, 700, "hello world")]])
    # splice an /Encrypt reference into the trailer dictionary
    assert b"trailer" in plain
    import pytest as _pytest

    for splice in (b"trailer\n<< /Encrypt 9 0 R ", b"trailer\n<</Encrypt<</V 1>> "):
        enc = plain.replace(b"trailer\n<<", splice, 1)
        assert enc != plain
        with _pytest.raises(EncryptedPdfError):
            extract_pdf_one(enc)
        text, spans, n, kind, ok, err = extract_one(enc)
        assert not ok and kind == "error" and "EncryptedPdfError" in err
        assert text == "" and spans == [] and n == 0
    # the unmodified file still parses
    assert extract_pdf_one(plain)[0] == "hello world"
    # an UNENCRYPTED doc that merely mentions the pattern in content is kept
    about = make_pdf(
        [[(72, 700, "see /Encrypt 9 0 R in trailer dicts")]], compress=False
    )
    assert b"/Encrypt 9 0 R" in about
    assert extract_pdf_one(about)[0] == "see /Encrypt 9 0 R in trailer dicts"


def _mini_pdf(objects_body: list[bytes], root: int) -> bytes:
    out = [b"%PDF-1.4\n"]
    for i, body in enumerate(objects_body, start=1):
        out.append(b"%d 0 obj\n%s\nendobj\n" % (i, body))
    out.append(b"trailer\n<< /Size %d /Root %d 0 R >>\n%%%%EOF\n"
               % (len(objects_body) + 1, root))
    return b"".join(out)


def _content_obj(raw: bytes) -> bytes:
    return (b"<< /Length %d >>\nstream\n" % len(raw)) + raw + b"\nendstream"


def test_resources_inherited_from_pages_ancestor():
    """/Resources on the /Pages node (PDF 7.7.3.4 inheritance) must be
    found; previously the page-header fallback fabricated phantom fonts
    and the real /Font dict was never consulted."""
    from pdf_extractor_spark.extract.pdf_parser import extract_pdf_one

    raw = b"BT /F1 12 Tf 72 700 Td (inherited resources) Tj ET"
    pdf = _mini_pdf(
        [
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
            b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
            b"/Resources << /Font << /F1 1 0 R >> >> >>",
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R >>",
            _content_obj(raw),
            b"<< /Type /Catalog /Pages 2 0 R >>",
        ],
        root=5,
    )
    assert extract_pdf_one(pdf)[0] == "inherited resources"


def test_pages_emitted_in_kids_order_not_object_order():
    """/Kids [5, 3]: object 5's page text must come FIRST even though its
    object number is higher (incremental updates renumber freely)."""
    from pdf_extractor_spark.extract.pdf_parser import extract_pdf_one

    pdf = _mini_pdf(
        [
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
            b"<< /Type /Pages /Kids [5 0 R 3 0 R] /Count 2 "
            b"/Resources << /Font << /F1 1 0 R >> >> >>",
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R >>",
            _content_obj(b"BT /F1 12 Tf 72 700 Td (second page) Tj ET"),
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 6 0 R >>",
            _content_obj(b"BT /F1 12 Tf 72 700 Td (first page) Tj ET"),
            b"<< /Type /Catalog /Pages 2 0 R >>",
        ],
        root=7,
    )
    text = extract_pdf_one(pdf)[0]
    assert text.index("first page") < text.index("second page")


def test_pdf_header_after_preamble_bytes():
    """%PDF- within the first 1024 bytes (HTTP-injected preamble) must
    still route to the PDF parser; an HTML page that merely mentions
    %PDF- must not."""
    from pdf_extractor_spark.extract.udfs import extract_one

    plain = make_pdf([[(72, 700, "offset header")]])
    junk = b"x" * 37 + b"\r\n"
    text, _, _, kind, ok, _ = extract_one(junk + plain)
    assert kind == "pdf" and ok and text == "offset header"
    html = ("<html><body><article><p>all about %PDF- headers and other "
            "markers in files, a long enough paragraph to keep.</p>"
            "</article></body></html>").encode()
    text, _, _, kind, ok, _ = extract_one(html)
    assert kind == "html" and ok and "all about %PDF- headers" in text
