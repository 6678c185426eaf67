"""From-scratch HTML main-content extractor (lxml-style, no lxml).

Replaces the reference's LLM extraction call (reference src/extractor.py:38-136)
with a deterministic three-stage pipeline:

  1. a regex-driven tag lexer + element stack (a minimal DOM tokenizer);
  2. block assembly: character runs are flushed into blocks at block-level tag
     boundaries, tracking per block the source span, total chars, anchor chars
     (text inside <a>), and the ancestor element path;
  3. Boilerpipe/trafilatura-class classification: text density + link density
     + ancestor-tag rules decide which blocks are main content (the shallow
     text-feature approach of Kohlschütter/Fankhauser/Nejdl, "Boilerplate
     Detection using Shallow Text Features", WSDM 2010 — public method,
     implementation from scratch).

The function is PURE — output depends only on the input bytes — which is what
makes the Spark pipeline byte-identical at any parallelism level.

Output: ``(text, spans, n_blocks)`` where ``text`` is main-content blocks
joined by ``"\\n\\n"`` and each span ``(start, end)`` is the half-open source
region (in decoded-string offsets) a block came from. The invariant
``normalize(strip_tags(source[start:end])) == block_text`` is tested in
tests/test_html_extract.py.
"""

from __future__ import annotations

import html as _htmllib
import re
from dataclasses import dataclass

# --- tokenizer ---------------------------------------------------------------

_TAG_RE = re.compile(
    r"<!--.*?(?:-->|$)"  # comments (unterminated comment swallows rest)
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"
    r"|<!DOCTYPE[^>]*>"
    r"|<\?[^>]*>"
    r"|</\s*([a-zA-Z][a-zA-Z0-9:-]*)\s*>"  # close tag  -> group 1
    r"|<\s*([a-zA-Z][a-zA-Z0-9:-]*)((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)(/?)>",  # open -> 2,3,4
    re.DOTALL,
)

# Elements whose raw text content is never document text.
_RAW_TEXT = {"script", "style", "noscript", "template", "textarea", "svg", "math", "title"}

# Tags that end/start a text block when opened or closed.
_BLOCK_TAGS = {
    "address", "article", "aside", "blockquote", "body", "br", "caption", "dd",
    "div", "dl", "dt", "fieldset", "figcaption", "figure", "footer", "form",
    "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr", "html", "li", "main",
    "nav", "ol", "p", "pre", "section", "table", "tbody", "td", "tfoot", "th",
    "thead", "tr", "ul",
}

# Void elements: never pushed on the stack.
_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link", "meta",
    "param", "source", "track", "wbr",
}

# Ancestor tags that mark a block as boilerplate regardless of density.
_BOILERPLATE_ANCESTORS = {"nav", "footer", "header", "aside", "form"}

_HEADING_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6"}

_WS_RE = re.compile(r"\s+")

# Classification thresholds (Boilerpipe-class defaults).
MIN_CONTENT_CHARS = 25
MAX_LINK_DENSITY = 0.33
MIN_HEADING_CHARS = 3
SHORT_BLOCK_MIN_CHARS = 8


@dataclass(frozen=True)
class ExtractContext:
    """M4 — per-run extraction options threaded into every per-document
    call (the reference prefixes a per-run context onto each mapped item,
    reference src/extractor.py:161-183; here the context is the classifier
    threshold set, closed over by the vectorized UDF).

    Frozen + tiny so it pickles into the UDF closure and rides to every
    executor once per task, not per row.
    """

    min_content_chars: int = MIN_CONTENT_CHARS
    max_link_density: float = MAX_LINK_DENSITY
    min_heading_chars: int = MIN_HEADING_CHARS
    short_block_min_chars: int = SHORT_BLOCK_MIN_CHARS


DEFAULT_CONTEXT = ExtractContext()


class _Block:
    __slots__ = ("parts", "anchor_chars", "start", "end", "tag", "path_flags", "text")

    def __init__(self) -> None:
        self.parts: list[str] = []
        self.anchor_chars = 0
        self.start = -1
        self.end = -1
        self.tag = ""  # nearest enclosing block-level tag at flush time
        self.path_flags = False  # True if any boilerplate ancestor
        self.text = ""  # normalized text, set once at flush time


_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)""", re.IGNORECASE
)

# supported declared charsets -> python codec (whitelist keeps decoding
# deterministic; anything else falls back to utf-8-replace)
_CODECS = {
    "utf-8": "utf-8", "utf8": "utf-8",
    "iso-8859-1": "latin-1", "latin-1": "latin-1", "latin1": "latin-1",
    "windows-1252": "cp1252", "cp1252": "cp1252",
    "iso-8859-15": "iso-8859-15",
    "ascii": "ascii", "us-ascii": "ascii",
}


def _decode(payload: bytes) -> str:
    """Decode page bytes: a UTF byte-order mark wins (per WHATWG encoding
    sniffing), then a declared <meta charset> when it is a supported
    single-byte/utf-8 codec, else utf-8 with replacement (the
    Common-Crawl-safe default). Pure function of the bytes."""
    if payload[:2] in (b"\xff\xfe", b"\xfe\xff") and payload[:3] != b"\xef\xbb\xbf":
        try:
            # utf-16 with BOM: codec consumes the BOM and picks endianness
            return payload.decode("utf-16")
        except UnicodeDecodeError:
            pass
    if payload[:3] == b"\xef\xbb\xbf":
        return payload[3:].decode("utf-8", errors="replace")
    m = _CHARSET_RE.search(payload[:2048])
    if m:
        codec = _CODECS.get(m.group(1).decode("ascii", "ignore").lower())
        if codec:
            try:
                return payload.decode(codec)
            except UnicodeDecodeError:
                pass
    return payload.decode("utf-8", errors="replace")


def tokenize(source: str):
    """Yield (kind, tag, text, start, end) events.

    kind ∈ {"text", "open", "close"}. Raw-text element bodies are skipped.
    """
    pos = 0
    n = len(source)
    while pos < n:
        m = _TAG_RE.search(source, pos)
        if m is None:
            if pos < n:
                yield ("text", "", source[pos:n], pos, n)
            return
        if m.start() > pos:
            yield ("text", "", source[pos : m.start()], pos, m.start())
        close_tag, open_tag, _attrs, self_close = m.group(1), m.group(2), m.group(3), m.group(4)
        if close_tag is not None:
            yield ("close", close_tag.lower(), "", m.start(), m.end())
            pos = m.end()
        elif open_tag is not None:
            tag = open_tag.lower()
            if tag in _RAW_TEXT and not self_close:
                # skip to the matching close tag (case-insensitive)
                cm = re.compile(rf"</\s*{re.escape(tag)}\s*>", re.IGNORECASE).search(
                    source, m.end()
                )
                yield ("open", tag, "", m.start(), m.end())
                end = cm.end() if cm else n
                yield ("close", tag, "", end, end)
                pos = end
            else:
                yield ("open", tag, "", m.start(), m.end())
                if self_close and tag not in _VOID:
                    yield ("close", tag, "", m.end(), m.end())
                pos = m.end()
        else:
            pos = m.end()  # comment / doctype / PI


def _normalize_ws(s: str) -> str:
    # identical to _WS_RE.sub(" ", s).strip() (str.split() splits on the
    # same unicode whitespace set \s matches) but ~3x faster — this is the
    # hottest scalar in the HTML path
    return " ".join(s.split())


def strip_tags_and_normalize(fragment: str) -> str:
    """Normalize a raw source fragment the same way block text is built.

    Used by the span invariant test: for every emitted span,
    ``strip_tags_and_normalize(source[start:end]) == block_text``.
    """
    parts = []
    for kind, _tag, text, _s, _e in tokenize(fragment):
        if kind == "text":
            parts.append(_htmllib.unescape(text))
    return _normalize_ws("".join(parts))


def _assemble_blocks(source: str) -> list[_Block]:
    blocks: list[_Block] = []
    cur = _Block()
    stack: list[str] = []  # open element tags
    anchor_depth = 0
    boiler_depth = 0

    def flush() -> None:
        nonlocal cur
        if cur.parts:
            t = _normalize_ws("".join(cur.parts))
            if t:
                cur.text = t  # normalize exactly once per block
                blocks.append(cur)
        cur = _Block()

    for kind, tag, text, start, end in tokenize(source):
        if kind == "text":
            unescaped = _htmllib.unescape(text)
            if not unescaped.strip():
                if cur.parts:
                    cur.parts.append(" ")
                continue
            if cur.start < 0:
                cur.start = start
                # nearest enclosing block tag at block birth
                cur.tag = next(
                    (t for t in reversed(stack) if t in _BLOCK_TAGS), ""
                )
            cur.path_flags = cur.path_flags or boiler_depth > 0
            cur.end = end
            cur.parts.append(unescaped)
            if anchor_depth > 0:
                cur.anchor_chars += len(_normalize_ws(unescaped))
        elif kind == "open":
            if tag in _BLOCK_TAGS:
                flush()
            if tag == "a":
                anchor_depth += 1
            if tag in _BOILERPLATE_ANCESTORS:
                boiler_depth += 1
            if tag not in _VOID:
                stack.append(tag)
        else:  # close
            if tag in _BLOCK_TAGS:
                flush()
            if tag == "a" and anchor_depth > 0:
                anchor_depth -= 1
            if tag in _BOILERPLATE_ANCESTORS and boiler_depth > 0:
                boiler_depth -= 1
            # pop the nearest matching open tag (forgiving of malformed HTML)
            for i in range(len(stack) - 1, -1, -1):
                if stack[i] == tag:
                    del stack[i:]
                    break
    flush()
    return blocks


def _classify(blocks: list[_Block], ctx: ExtractContext = DEFAULT_CONTEXT) -> list[bool]:
    n_chars = [len(b.text) for b in blocks]
    link_density = [
        (b.anchor_chars / c) if c else 1.0 for b, c in zip(blocks, n_chars)
    ]

    keep = [False] * len(blocks)
    any_content = False
    for i, b in enumerate(blocks):
        if b.path_flags:
            continue
        if n_chars[i] >= ctx.min_content_chars and link_density[i] <= ctx.max_link_density:
            keep[i] = True
            any_content = True

    # Headings survive if the page has real content at all.
    if any_content:
        for i, b in enumerate(blocks):
            if (
                not keep[i]
                and not b.path_flags
                and b.tag in _HEADING_TAGS
                and n_chars[i] >= ctx.min_heading_chars
                and link_density[i] <= ctx.max_link_density
            ):
                keep[i] = True

    # Short zero-link blocks sandwiched between two kept blocks are kept
    # (Boilerpipe's neighbour rule for short quotes / one-line paragraphs).
    for i in range(1, len(blocks) - 1):
        if (
            not keep[i]
            and keep[i - 1]
            and keep[i + 1]
            and not blocks[i].path_flags
            and blocks[i].anchor_chars == 0
            and n_chars[i] >= ctx.short_block_min_chars
        ):
            keep[i] = True
    return keep


def extract_html_one(
    payload: bytes, ctx: ExtractContext = DEFAULT_CONTEXT
) -> tuple[str, list[tuple[int, int]], int]:
    """bytes -> (main text, spans into decoded source, n_blocks)."""
    source = _decode(payload)
    blocks = _assemble_blocks(source)
    keep = _classify(blocks, ctx)
    out_texts: list[str] = []
    spans: list[tuple[int, int]] = []
    for b, k in zip(blocks, keep):
        if not k:
            continue
        out_texts.append(b.text)
        spans.append((b.start, b.end))
    return "\n\n".join(out_texts), spans, len(spans)
