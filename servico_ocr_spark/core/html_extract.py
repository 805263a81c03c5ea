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

1. Lex with the compiled-regex scanner below (lenient — malformed input
   never raises; entities and charrefs are decoded with
   ``html.unescape``). ``_BlockParser`` (stdlib ``html.parser``) is the
   behavioral REFERENCE on well-formed markup, differential-tested in
   test_html_extract.py; on malformed-construct *recovery* the scanner
   is the specification — see the scanner header for the exact rules
   and the documented divergences.
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

import re
from html import unescape
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


def extract_blocks_reference(html: str) -> list[tuple[str, int, int, int]]:
    """stdlib-``HTMLParser`` implementation — the behavioral reference for
    the fast scanner below (differential-tested in test_html_extract.py)."""
    parser = _BlockParser()
    parser.feed(html)
    parser.close()
    return parser.blocks


# ---------------------------------------------------------------------------
# Fast scanner. ``html.parser`` is a pure-Python char-by-char state machine
# (~0.4 ms per 1 KB page — at 10^12 pages the parse IS the pipeline cost).
# This scanner moves the lexing into one compiled regex (C), keeping the
# exact block semantics of ``_BlockParser``: same DROP/BLOCK/a/br/hr
# handling, same entity decoding (``html.unescape`` is the same
# replacement table ``convert_charrefs`` uses), same whitespace collapse.
# Equivalence on markup whose constructs are all *terminated* and whose
# attribute quotes are balanced is pinned by a seeded fuzz differential
# against ``extract_blocks_reference`` (test_html_extract.py; the fuzz
# alphabet stays inside that envelope). Outside it — unterminated
# constructs, and tags with UNBALANCED attribute quotes (``<div a=">``),
# where stdlib's attrfind can swallow everything to the next quote while
# the scanner leaves the non-matching tag as text and keeps parsing —
# the scanner is the spec and deliberately diverges from stdlib (whose
# recovery is a version-dependent private detail, and which can even
# RAISE — stdlib ``parse_marked_section`` asserts on ``<![junk]>``):
#   * stdlib EOF recovery consumes an unterminated ``<!--``/``<![``/
#     start/end tag up to the next ``>`` as text; the scanner instead
#     leaves the construct's characters as text and KEEPS PARSING real
#     tags after it — a stray ``<!--`` degrades one text run, not the
#     page's whole block structure.
#   * ``<![junk]>`` is consumed as a declaration (no event, no raise).
# Both behaviors are pinned by unit tests; extract_main's never-raises
# promise holds for the scanner on arbitrary bytes.
# ---------------------------------------------------------------------------

#: one token per markup construct; text between matches is character data.
#: Attribute values may contain ``>`` only when quoted — same tolerance as
#: the stdlib parser *while quotes are balanced* (an unbalanced quote
#: makes the tag unmatched text here, where stdlib's attrfind may instead
#: swallow input to the next quote — see the envelope note above).
#: A ``<`` not starting a construct stays text, as does
#: an unterminated construct (no alternative matches → the run rides to
#: the next construct, which is where stdlib resynchronizes too).
#: Alternatives mirror stdlib dispatch order: ``<!--`` is always a strict
#: comment (closed by ``--\s*>``, _markupbase._commentclose — never
#: reinterpreted as a declaration, hence the ``(?!--)`` guard);
#: ``<![CDATA[`` closes on ``]\s*]\s*>``; other ``<!``/``<?`` run to the
#: first ``>``; end tags are strict (`</\s*name\s*>`) then tolerant
#: (``</name junk>`` — no space before the name, per tagfind_tolerant)
#: then bogus (``</junk>`` consumed, no event).
_TAG_RE = re.compile(
    r"""<(?:
        !--.*?--\s*>                  # comment (strict close)
      | !\[CDATA\[.*?\]\s*\]\s*>      # marked section
      | (?:!(?!--)|\?)[^>]*>          # doctype / declaration / PI
      | /\s*(?P<cname>[a-zA-Z][-.a-zA-Z0-9:_]*)\s*>      # strict end tag
      | /(?P<cname2>[a-zA-Z][^\t\n\r\f\ />\x00]*)[^>]*>  # tolerant end tag
      | /[^>]*>                       # bogus close: consumed, no event
                                      # (name charsets mirror stdlib:
                                      # endtagfind's narrow class for the
                                      # strict form, tagfind_tolerant's
                                      # ASCII-delimiter class elsewhere —
                                      # NOT \s: U+00A0 is part of a NAME)
      | (?P<name>[a-zA-Z][^\t\n\r\f\ />\x00]*)
        (?P<attrs>(?:"[^"]*"|'[^']*'|[^>"'])*)>
    )""",
    re.S | re.X,
)

#: script/style content runs to the matching STRICT close tag — stdlib
#: only leaves CDATA mode via endtagfind (``</\s*script\s*>``); a close
#: tag with attributes (``</script foo>``) stays script data.
_CDATA_END = {
    "script": re.compile(r"</\s*script\s*>", re.I),
    "style": re.compile(r"</\s*style\s*>", re.I),
}

#: stdlib's tolerant attribute lexer (html.parser.attrfind_tolerant):
#: unquoted attr VALUES absorb a trailing ``/`` (``href=foo/``) but attr
#: NAMES cannot contain one (``<a & b<A/>`` ends ``/>``), which is what
#: decides start-tag vs startendtag. Reuse it on the rare trailing-slash
#: path so the decision is stdlib's own, not a heuristic.
try:  # private but stable across 3.x; fall back to an equivalent copy
    from html.parser import attrfind_tolerant as _ATTR_RE
except ImportError:  # pragma: no cover
    _ATTR_RE = re.compile(
        r'((?<=[\'"\s/])[^\s/>][^\s/=>]*)(\s*=+\s*'
        r'(\'[^\']*\'|"[^"]*"|(?![\'"])[^>\s]*))?(?:\s|/(?!>))*'
    )


#: tagfind_tolerant's tail: the name also swallows trailing whitespace
#: and ``/`` chars not directly before ``>``.
_TAGTAIL_RE = re.compile(r"(?:\s|/(?!>))*")


def _is_startend(attrs: str) -> bool:
    """True iff a start tag whose raw attr text is ``attrs`` (the slice
    between the tag name and ``>``) is a self-closing tag under stdlib
    ``parse_starttag`` semantics: after consuming the name tail and the
    attributes with ``attrfind_tolerant``, the remainder strips to
    ``"/>"``."""
    # Reconstruct the view parse_starttag sees: a delimiter before the
    # attrs (the tag name's last char never satisfies attrfind's
    # lookbehind, but tagfind's tail leaves k on space/slash) and the
    # closing '>' after them (so ``/(?!>)`` sees it).
    probe = " " + attrs + ">"
    k = _TAGTAIL_RE.match(probe, 1).end()
    while True:
        m = _ATTR_RE.match(probe, k)
        if not m:
            break
        k = m.end()
    return probe[k:].strip() == "/>"


def extract_blocks(html: str) -> list[tuple[str, int, int, int]]:
    """All non-empty text blocks as (text, chars, link_chars, n_links)."""
    blocks: list[tuple[str, int, int, int]] = []
    frags: list[str] = []
    chars = link_chars = n_links = 0
    drop_depth = a_depth = 0

    def flush() -> None:
        nonlocal frags, chars, link_chars, n_links
        text = " ".join("".join(frags).split())
        if text:
            blocks.append((text, chars, link_chars, n_links))
        frags = []
        chars = link_chars = n_links = 0

    pos = 0
    search = _TAG_RE.search
    n = len(html)
    # Linearity guard (exact semantics): every _TAG_RE alternative ends
    # at a literal '>', so past the LAST '>' no construct can start — the
    # tail is all character data. Without this, a truncated or
    # adversarial page dense with unterminated '<name' runs makes each
    # '<' attempt rescan to EOF (quadratic per-task latency at real-web
    # scale; a stretch that IS closed by a far-away '>' is linear anyway,
    # because the first '<' matches as one tolerant start tag consuming
    # to that '>'). One rfind per document, O(1) per iteration — the
    # per-iteration find() variant re-scanned every inter-tag gap and
    # cost +45% on the html face (measured, BENCH/BASELINE.md r4).
    last_gt = html.rfind(">")
    while pos < n:
        m = search(html, pos) if pos <= last_gt else None
        start = m.start() if m else n
        if start > pos and not drop_depth:
            data = unescape(html[pos:start])
            frags.append(data)
            # non-ws count via split(): C-speed and exactly the
            # reference's ``c.isspace()`` definition of whitespace
            nonws = sum(map(len, data.split()))
            chars += nonws
            if a_depth:
                link_chars += nonws
        if not m:
            break
        pos = m.end()
        tag = m.group("name")
        if tag is not None:
            tag = tag.lower()
            # self-closing iff the trailing '/' is not glued to an
            # unquoted attribute value — html.parser reads <a href=foo/>
            # as a plain start tag with value "foo/", but <a foo/> as a
            # startendtag (names can't absorb '/'); decided by stdlib's
            # own attr lexer in _is_startend.
            s = m.group("attrs")
            if s.rstrip().endswith("/") and _is_startend(s):
                # startendtag semantics: never touches drop depth/anchors
                if drop_depth or tag in DROP_TAGS:
                    continue
                if tag in BLOCK_TAGS or tag == "hr":
                    flush()
                elif tag == "br":
                    frags.append(" ")
                continue
            if tag in DROP_TAGS:
                if tag in _CDATA_END:
                    mm = _CDATA_END[tag].search(html, pos)
                    if not mm:
                        break  # unterminated CDATA: rest is dropped data
                    pos = mm.end()  # open + close consumed, depth net 0
                else:
                    drop_depth += 1
                continue
            if drop_depth:
                continue
            if tag in BLOCK_TAGS or tag == "hr":
                flush()
            elif tag == "br":
                frags.append(" ")
            elif tag == "a":
                a_depth += 1
                n_links += 1
        else:
            tag = m.group("cname") or m.group("cname2")
            if tag is None:
                continue  # comment / declaration / bogus close
            tag = tag.lower()
            if tag in DROP_TAGS:
                if drop_depth:
                    drop_depth -= 1
                continue
            if drop_depth:
                continue
            if tag in BLOCK_TAGS:
                flush()
            elif tag == "a" and a_depth:
                a_depth -= 1
    flush()
    return blocks


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
