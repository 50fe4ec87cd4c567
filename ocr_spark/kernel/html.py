"""HTML main-content extraction: tag-tree segmentation + density scoring.

This is the transcript-domain analog of the reference's main-content
detection: ``Ingredients_OCR.py:38-71`` walks OCR blocks with an on/off
accumulation state machine (header match switches content on; low-signal
blocks switch it off), and ``NFT_PreProcessing.py:166-229`` crops the image
to the label region before extraction.  Here the "image" is an HTML payload
and the "label region" is the main content; chrome (nav/header/footer/aside)
is dropped and remaining blocks are kept or discarded by text-density /
link-density rules in the spirit of Boilerpipe's NumWordsRules classifier.

The algorithm is a single deterministic pass over the tag stream (no external
parser), so the oracle and the vectorized batch path share it verbatim.

Rules (canonical, documented so parity is testable):
- content inside <script> <style> <noscript> <svg> <template> is dropped;
- content inside <header> <footer> <nav> <aside> is dropped (any nesting);
- block boundaries at: div p h1-h6 li ul ol table thead tbody tr
  section article main blockquote pre br hr form figure figcaption;
  td/th are CELL separators (joined into the row block with a space),
  not block boundaries — the table row is the semantic line;
- HTML comments are dropped; entities &amp; &lt; &gt; &quot; &#39; &nbsp;
  are decoded (in that order, after tag removal);
- a block is KEPT iff  words >= MIN_WORDS  and  link_density <= MAX_LINK_D,
  where link_density = (chars emitted while inside an <a>) / (total chars),
  both measured on whitespace-collapsed text;
- <h1>-<h6> blocks are kept with a relaxed word floor (headings are short
  but content-bearing), still subject to the link-density cap.
"""

from __future__ import annotations

import re

# Block-level boundary tags (opening or closing splits a block).
_BLOCK_TAGS = frozenset(
    """div p h1 h2 h3 h4 h5 h6 li ul ol table thead tbody tr section
    article main blockquote pre br hr form figure figcaption""".split()
)
# Cell tags join their content into the enclosing row block with a space
# instead of starting a new block: a <td> holds 1-2 words ("25 g"), so
# treating it as a block would drop every table cell under MIN_WORDS —
# the table ROW is the semantic line (the reference's same-line grouping,
# NFT_OCR.py:45-82).
_CELL_TAGS = frozenset("td th".split())
# Subtrees whose text is never content.
_DROP_TAGS = frozenset("script style noscript svg template".split())
# Structural chrome subtrees (the boilerplate the north rule targets).
_CHROME_TAGS = frozenset("header footer nav aside".split())
_HEADING_TAGS = frozenset("h1 h2 h3 h4 h5 h6".split())

MIN_WORDS = 3
MIN_WORDS_HEADING = 1
MAX_LINK_DENSITY = 0.4

_TOKEN_RE = re.compile(r"<!--.*?-->|<[^>]*>|[^<]+", re.DOTALL)
_TAG_NAME_RE = re.compile(r"^</?\s*([a-zA-Z][a-zA-Z0-9]*)")
_WS_RE = re.compile(r"\s+")

_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)


def _decode_entities(s: str) -> str:
    for k, v in _ENTITIES:
        if k in s:
            s = s.replace(k, v)
    return s


def looks_like_html(text: str) -> bool:
    """Cheap payload classifier: does this payload need the HTML path?"""
    return "<" in text and bool(re.search(r"<[a-zA-Z!/]", text))


def html_extract(html: str) -> list[str]:
    """Strip boilerplate; return the kept content blocks in document order.

    Returns a list of whitespace-collapsed block texts.  Deterministic pure
    function — shared by oracle and UDF.
    """
    drop_depth = 0
    chrome_depth = 0
    link_depth = 0
    heading = False

    blocks: list[str] = []
    # current block accumulators
    parts: list[str] = []
    link_chars = 0
    total_chars = 0
    cur_heading = False

    def flush() -> None:
        nonlocal parts, link_chars, total_chars, cur_heading
        text = _WS_RE.sub(" ", "".join(parts)).strip()
        if text:
            words = text.count(" ") + 1
            ld = (link_chars / total_chars) if total_chars else 0.0
            floor = MIN_WORDS_HEADING if cur_heading else MIN_WORDS
            if words >= floor and ld <= MAX_LINK_DENSITY:
                blocks.append(text)
        parts = []
        link_chars = 0
        total_chars = 0
        cur_heading = False

    for m in _TOKEN_RE.finditer(html):
        tok = m.group(0)
        if tok.startswith("<!--"):
            continue
        if tok.startswith("<"):
            nm = _TAG_NAME_RE.match(tok)
            if not nm:
                continue
            name = nm.group(1).lower()
            closing = tok.startswith("</")
            self_closing = tok.endswith("/>")
            if name in _DROP_TAGS:
                if closing:
                    drop_depth = max(0, drop_depth - 1)
                elif not self_closing:
                    drop_depth += 1
                continue
            if name in _CHROME_TAGS:
                flush()
                if closing:
                    chrome_depth = max(0, chrome_depth - 1)
                elif not self_closing:
                    chrome_depth += 1
                continue
            if name == "a":
                if closing:
                    link_depth = max(0, link_depth - 1)
                elif not self_closing:
                    link_depth += 1
                continue
            if name in _CELL_TAGS:
                parts.append(" ")  # cell separator within the row block
                continue
            if name in _BLOCK_TAGS:
                flush()
                if name in _HEADING_TAGS and not closing:
                    heading = True
                    cur_heading = True
                else:
                    # any non-heading block boundary ends a heading scope —
                    # an unclosed <h*> must not leak its relaxed word floor
                    # over the rest of the document
                    heading = False
            continue
        # text node
        if drop_depth or chrome_depth:
            continue
        text = _decode_entities(tok)
        stripped = _WS_RE.sub(" ", text)
        n = len(stripped.strip())
        if n:
            total_chars += n
            if link_depth:
                link_chars += n
            if heading:
                cur_heading = True
        parts.append(text)

    flush()
    return blocks
