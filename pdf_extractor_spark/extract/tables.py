"""From-scratch HTML table-structure extractor: grid assembly with
colspan/rowspan occupancy and nested-table separation.

The reference's core domain is tabular financial data (reference
src/extractor.py:38-136 asks the LLM for statement tables;
reconstruct_table.py rebuilds them); this module is the deterministic
structural counterpart for HTML payloads: every ``<table>`` becomes a set of
``(table_idx, row, col, text)`` cells with real grid semantics —

- ``colspan``/``rowspan`` occupy their full rectangle, and later cells in
  the affected rows shift right past occupied columns (the W3C table-model
  placement algorithm, simplified to the common monotone case);
- nested tables get their own ``table_idx`` (document order of the opening
  tag); their text belongs to the inner table's cells, never the outer cell;
- malformed input is handled forgivingly: ``<td>`` without ``<tr>`` implies
  row 0, unclosed cells/rows/tables flush at the enclosing close or EOF,
  raw-text element bodies (script/style/...) are skipped exactly as the
  main-content lexer does.

Pure function of the payload bytes — byte-identical output at any
parallelism level, same as extract_html_one.
"""

from __future__ import annotations

import html as _htmllib
import re

from pdf_extractor_spark.extract.html_parser import (
    _RAW_CLOSE,
    _RAW_TEXT,
    _TAG_RE,
    _decode,
    _normalize_ws,
)

_SPAN_ATTR_RE = re.compile(r"""(colspan|rowspan)\s*=\s*["']?([0-9]+)""", re.I)


class _Table:
    __slots__ = ("idx", "row", "occ", "col_cursor", "cell", "parts")

    def __init__(self, idx: int) -> None:
        self.idx = idx
        self.row = -1  # incremented by <tr>
        self.occ: dict[int, int] = {}  # col -> remaining rows occupied
        self.col_cursor = 0
        self.cell: tuple[int, int, int, int] | None = None  # row,col,cs,rs
        self.parts: list[str] = []


def extract_tables_one(payload: bytes) -> list[tuple[int, int, int, str]]:
    """bytes -> [(table_idx, row, col, cell_text)] in document order."""
    source = _decode(payload)
    out: list[tuple[int, int, int, str]] = []
    stack: list[_Table] = []
    next_idx = 0
    unescape = _htmllib.unescape

    def close_cell(t: _Table) -> None:
        if t.cell is None:
            return
        row, col, cs, rs = t.cell
        out.append((t.idx, row, col, _normalize_ws("".join(t.parts))))
        # occupy the cell's rectangle for FUTURE rows (rowspan > 1)
        if rs > 1:
            for c in range(col, col + cs):
                t.occ[c] = max(t.occ.get(c, 0), rs - 1)
        t.cell = None
        t.parts = []

    def open_row(t: _Table) -> None:
        close_cell(t)
        t.row += 1
        # one row consumed from every rowspan carryover. A col with n >= 1
        # is occupied in the NEW row; it stays in the map with value n-1
        # (value 0 = occupied this row, freed at the next row) — dropping
        # n-1 == 0 entries here would free a rowspan-2 col one row early.
        t.occ = {c: n - 1 for c, n in t.occ.items() if n >= 1}
        t.col_cursor = 0

    def open_cell(t: _Table, attrs: str) -> None:
        close_cell(t)
        if t.row < 0:
            t.row = 0
        col = t.col_cursor
        while col in t.occ:
            col += 1
        cs = rs = 1
        if attrs and ("colspan" in attrs or "rowspan" in attrs
                      or "COLSPAN" in attrs or "ROWSPAN" in attrs):
            for m in _SPAN_ATTR_RE.finditer(attrs):
                v = max(1, int(m[2]))
                if m[1].lower() == "colspan":
                    cs = v
                else:
                    rs = v
        t.cell = (t.row, col, cs, rs)
        t.col_cursor = col + cs

    pos = 0
    n = len(source)
    for m in _TAG_RE.finditer(source):
        mstart, mend = m.span()
        if mstart < pos:
            continue  # inside a skipped raw-text body
        if mstart > pos and stack and stack[-1].cell is not None:
            text = source[pos:mstart]
            if not text.isspace():
                stack[-1].parts.append(unescape(text) if "&" in text else text)
            else:
                stack[-1].parts.append(" ")
        tag = m[1]
        if tag is not None:
            # ---- close tag ----
            tag = tag.lower()
            if stack:
                t = stack[-1]
                if tag in ("td", "th"):
                    close_cell(t)
                elif tag == "tr":
                    close_cell(t)
                elif tag == "table":
                    close_cell(t)
                    stack.pop()
            pos = mend
            continue
        tag = m[2]
        if tag is None:
            pos = mend  # comment / doctype / CDATA / PI
            continue
        # ---- open tag ----
        tag = tag.lower()
        if tag in _RAW_TEXT:
            cm = _RAW_CLOSE[tag].search(source, mend)
            pos = cm.end() if cm else n
            continue
        if tag == "table":
            stack.append(_Table(next_idx))
            next_idx += 1
        elif stack:
            t = stack[-1]
            if tag == "tr":
                open_row(t)
            elif tag in ("td", "th"):
                open_cell(t, m[3] or "")
        pos = mend
    # EOF: trailing text run, then flush anything left open (malformed input)
    if pos < n and stack and stack[-1].cell is not None:
        text = source[pos:n]
        if not text.isspace():
            stack[-1].parts.append(unescape(text) if "&" in text else text)
    while stack:
        close_cell(stack[-1])
        stack.pop()
    return out
