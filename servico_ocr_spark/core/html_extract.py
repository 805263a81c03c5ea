"""Deterministic HTML main-content extraction (boilerplate strip).

The north rule's web-page face of the engine: given raw ``html`` bytes of
a Common-Crawl-style page, emit the main text, per-block span offsets,
and block-level metrics. This is the DOM-heuristics sibling of the OCR
kernel (`core/analyze.py` handles the PDF/layout face; this module
handles the HTML face) — same shape: a pure, deterministic, stdlib-only
per-document function that the Spark operator wraps in one Arrow batch
boundary (`operators/webtext.py`).

Algorithm (jusText/Boilerpipe-inspired, but deliberately minimal and
exactly specified so an SQL oracle can predict it on synthetic corpora):

1. Parse with ``html.parser.HTMLParser`` (lenient — malformed input never
   raises; entities and charrefs are decoded by ``convert_charrefs``).
2. Hard-drop regions: everything inside ``DROP_TAGS`` (script/style/head,
   and the structural boilerplate tags nav/header/footer/aside/form...)
   is discarded, with nesting tracked by a depth counter.
3. Block segmentation: ``BLOCK_TAGS`` open/close flush the current text
   block (a flat flush model — unclosed ``<p>`` is handled naturally).
   ``<br>`` contributes whitespace; ``<hr>`` flushes.
4. Per block, count non-whitespace chars total and inside ``<a>``
   anchors. A non-empty block is KEPT iff
   ``3 * link_chars <= total_chars`` (link density ≤ 1/3, exact integer
   arithmetic — no float) and its word count ≥ ``min_words``.
5. Block text is whitespace-collapsed (``" ".join(text.split())``); kept
   blocks join with ``"\n"`` into ``main_text``; ``spans`` carries each
   kept block's [start, end) offsets in ``main_text``.

Reference analog: the region classifier + filter_regions render path
(app/util_ocr.py:236-320, app/util_markdown.py) decides which detected
regions reach the cleaned text; here the DOM plays the role of the
detected boxes and link density plays the role of the region class.
"""

from __future__ import annotations

from html.parser import HTMLParser

#: regions discarded wholesale (with nesting): scripts/styles/metadata
#: plus the structural boilerplate containers.
DROP_TAGS = frozenset(
    {
        "script", "style", "noscript", "template", "head", "title",
        "nav", "header", "footer", "aside", "form", "iframe", "svg",
        "button", "select", "option", "datalist", "object",
    }
)

#: tags that open/close a text block (flat flush model).
BLOCK_TAGS = frozenset(
    {
        "p", "div", "section", "article", "main", "body",
        "h1", "h2", "h3", "h4", "h5", "h6",
        "ul", "ol", "li", "dl", "dt", "dd",
        "table", "thead", "tbody", "tfoot", "tr", "td", "th",
        "blockquote", "pre", "address", "figcaption",
    }
)

#: link-density keep rule: keep iff DENSITY_DEN * link_chars <=
#: DENSITY_NUM * total_chars  (i.e. density <= NUM/DEN, exact integers).
DENSITY_NUM = 1
DENSITY_DEN = 3


class _BlockParser(HTMLParser):
    """Flat block collector; see module docstring for the exact rules."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._drop_depth = 0
        self._a_depth = 0
        self._frags: list[str] = []
        self._chars = 0  # non-whitespace chars in current block
        self._link_chars = 0  # ... of which inside <a>
        self._n_links = 0
        self.blocks: list[tuple[str, int, int, int]] = []
        # (collapsed_text, chars, link_chars, n_links)

    # -- block lifecycle ---------------------------------------------------

    def _flush(self) -> None:
        text = " ".join("".join(self._frags).split())
        if text:
            self.blocks.append(
                (text, self._chars, self._link_chars, self._n_links)
            )
        self._frags = []
        self._chars = 0
        self._link_chars = 0
        self._n_links = 0

    # -- parser events -----------------------------------------------------

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in DROP_TAGS:
            self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if tag in BLOCK_TAGS or tag == "hr":
            self._flush()
        elif tag == "br":
            self._frags.append(" ")
        elif tag == "a":
            self._a_depth += 1
            self._n_links += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in DROP_TAGS:
            if self._drop_depth:
                self._drop_depth -= 1
            return
        if self._drop_depth:
            return
        if tag in BLOCK_TAGS:
            self._flush()
        elif tag == "a" and self._a_depth:
            self._a_depth -= 1

    def handle_startendtag(self, tag: str, attrs) -> None:
        # void/self-closing: <br/>, <hr/>, and (malformed) <div/>
        if self._drop_depth or tag in DROP_TAGS:
            return
        if tag in BLOCK_TAGS or tag == "hr":
            self._flush()
        elif tag == "br":
            self._frags.append(" ")

    def handle_data(self, data: str) -> None:
        if self._drop_depth or not data:
            return
        self._frags.append(data)
        nonws = sum(1 for c in data if not c.isspace())
        self._chars += nonws
        if self._a_depth:
            self._link_chars += nonws

    def close(self) -> None:  # final implicit flush
        super().close()
        self._flush()


def extract_blocks(html: str) -> list[tuple[str, int, int, int]]:
    """All non-empty text blocks as (text, chars, link_chars, n_links)."""
    parser = _BlockParser()
    parser.feed(html)
    parser.close()
    return parser.blocks


def extract_main(html: bytes | str | None, min_words: int = 0) -> dict:
    """Extract the main content of one page; never raises.

    Returns ``{"main_text", "spans", "n_blocks", "n_kept",
    "n_dropped_link", "n_links", "main_chars", "main_words"}`` where
    ``spans`` is a list of ``(start, end)`` offsets of each kept block in
    ``main_text`` (blocks join with a single ``"\\n"``).
    """
    if html is None:
        text = ""
    elif isinstance(html, (bytes, bytearray, memoryview)):
        text = bytes(html).decode("utf-8", errors="replace")
    else:
        text = html
    blocks = extract_blocks(text)

    kept: list[str] = []
    spans: list[tuple[int, int]] = []
    n_dropped_link = 0
    n_links = 0
    offset = 0
    for block_text, chars, link_chars, links in blocks:
        n_links += links
        if DENSITY_DEN * link_chars > DENSITY_NUM * chars:
            n_dropped_link += 1
            continue
        if min_words and len(block_text.split()) < min_words:
            continue
        start = offset + (1 if kept else 0)  # +1 for the joining "\n"
        end = start + len(block_text)
        spans.append((start, end))
        kept.append(block_text)
        offset = end
    main_text = "\n".join(kept)
    return {
        "main_text": main_text,
        "spans": spans,
        "n_blocks": len(blocks),
        "n_kept": len(kept),
        "n_dropped_link": n_dropped_link,
        "n_links": n_links,
        "main_chars": len(main_text),
        "main_words": len(main_text.split()),
    }
