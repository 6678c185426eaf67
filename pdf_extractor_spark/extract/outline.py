"""From-scratch HTML document-outline extractor: heading hierarchy with
ancestor paths.

The extraction tier's structural complement to main-content text and
table-structure extraction (reference main.py drives per-document structure
through its remote extractor; this is the deterministic local counterpart
for the heading tree): every ``<h1>``..``<h6>`` becomes an
``(idx, level, title, path)`` row where ``path`` is the ``/``-joined titles
of the heading's open ANCESTORS under the standard outline nesting rule —
a new heading of level L closes every open heading of level >= L. Section
paths are what chunkers, TOC builders, and retrieval indexes key on.

Forgiving by construction (same tolerance posture as the table parser):
inline markup inside a heading contributes its text; a heading left open at
EOF or interrupted by the next heading still flushes; raw-text element
bodies never leak into titles (the shared lexer skips them). Pure function
of the payload bytes — byte-identical output at any parallelism level.
"""

from __future__ import annotations

import html as _htmllib

from pdf_extractor_spark.extract.html_parser import (
    _decode,
    _normalize_ws,
    tokenize,
)

_HEADINGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}


def extract_outline_one(payload: bytes) -> list[tuple[int, int, str, str]]:
    """bytes -> [(heading_idx, level, title, path)] in document order.

    ``path`` contains the ancestor titles only (empty string for a
    top-level heading); ``title`` is entity-unescaped and
    whitespace-normalized.
    """
    source = _decode(payload)
    out: list[tuple[int, int, str, str]] = []
    # open ancestor stack: (level, title)
    stack: list[tuple[int, str]] = []
    cur_level: int | None = None
    parts: list[str] = []
    unescape = _htmllib.unescape

    def flush() -> None:
        nonlocal cur_level, parts
        if cur_level is None:
            return
        title = _normalize_ws(unescape("".join(parts)))
        while stack and stack[-1][0] >= cur_level:
            stack.pop()
        path = "/".join(t for _, t in stack)
        out.append((len(out), cur_level, title, path))
        stack.append((cur_level, title))
        cur_level = None
        parts = []

    for kind, tag, text, _s, _e in tokenize(source):
        if kind == "open":
            lvl = _HEADINGS.get(tag)
            if lvl is not None:
                flush()  # heading interrupting an open heading
                cur_level = lvl
                parts = []
        elif kind == "close":
            if tag in _HEADINGS and cur_level is not None:
                flush()
        elif kind == "text" and cur_level is not None:
            parts.append(text)
    flush()  # heading left open at EOF
    return out
