"""Deterministic synthetic TokenSource.

The reference's OCR boundary is the single pytesseract call at
app/util_ocr.py:102 (image → Tesseract TSV token table). Everything graded
for byte-identity is *downstream* of that table, so the engine treats the
tokenizer as a pluggable ``TokenSource``:

    (url, text, archetype) -> token rows
    (level, page_num, block_num, par_num, line_num, word_num,
     left, top, width, height, conf, text)

Production deployments plug a pytesseract-backed source (see
``servico_ocr_spark.sources.ocr_engine``); this module is the deterministic
synthetic implementation used by tests and benchmarks: a pure function of
``(url, text, archetype)`` — same output regardless of partitioning, worker
count, or run — that lays the document's words onto synthetic A4-at-300dpi
pages following the fixture archetypes of FIXTURES.md §3 (which mirror the
reference example corpus in /root/reference/app/exemplos/).

Level semantics follow Tesseract TSV (app/util_ocr.py:27): the page row is
level 1 / block 0, each text block emits a level-2 bbox row followed by its
level-5 word rows. Non-word rows carry conf=-1 and empty text, so the
confidence filter (app/util_ocr.py:148-149) skips them.
"""

from __future__ import annotations

import zlib

ARCHETYPES = [
    "plain", "columns", "repeat_header", "quote", "sheetno",
    "news_image", "multipage_skew",
]

A4_W, A4_H = 2480, 3508  # px at 300 dpi
_NEWS_PAGE_SIZES = [
    (2550, 3300),   # Carta
    (2550, 4200),   # Legal
    (2000, 2000),   # Quadrado
    (2000, 1000),   # Faixa — crashes reference geometry (error-path fixture)
]

MARGIN = 300
LINE_H = 56
BLOCK_GAP = 90


def _h(*parts) -> int:
    """Deterministic 64-bit hash of the joined parts (crc32-based: this is
    test scaffolding on the hot path — in production the OCR engine sits
    here — and crc32 is ~5× cheaper than md5 while staying process- and
    partitioning-independent)."""
    key = "|".join(map(str, parts)).encode("utf-8")
    lo = zlib.crc32(key)
    hi = zlib.crc32(key, 0x5F3759DF)
    return (hi << 32) | lo


def _word_px(word: str) -> int:
    return 26 * len(word) + 14


def _conf(url: str, page: int, block: int, widx: int) -> int:
    """Deterministic confidence: ~10% of words land under CONF_LIMITE=30
    and must be dropped by the engine (app/util_ocr.py:39,148-149)."""
    v = _h(url, "conf", page, block, widx) % 100
    return v if v < 10 else 30 + (v % 70)


_WORD_BANK = [
    "ação", "justiça", "parágrafo", "decisão", "relatório", "página",
    "informação", "não", "também", "capítulo", "seção", "artigo",
    "processo", "análise", "cômputo", "índice", "memória", "período",
    "título", "único", "órgão", "está", "será", "após", "règle",
]


def _bank_words(url: str, tag: str, n: int) -> list:
    return [
        _WORD_BANK[_h(url, tag, i) % len(_WORD_BANK)] for i in range(n)
    ]


class _PageBuilder:
    """Accumulates token rows for one synthetic page."""

    def __init__(self, url: str, page_idx: int, page_w: int, page_h: int):
        self.url = url
        self.page = page_idx
        self.w = page_w
        self.h = page_h
        self.block = 0
        self.rows = [self._row(1, 0, 0, 0, 0, 0, 0, page_w, page_h, -1, "")]

    def _row(self, level, block, par, line, word, left, top, width, height,
             conf, text):
        return {
            "level": level, "page_num": self.page, "block_num": block,
            "par_num": par, "line_num": line, "word_num": word,
            "left": left, "top": top, "width": width, "height": height,
            "conf": conf, "text": text,
        }

    def add_block(self, words, x, y, wrap_width, fixed_conf=None):
        """Lay words left→right with wrapping; emits the level-2 bbox row
        (taken as box_xyla by the engine, app/util_ocr.py:144-145) followed
        by the level-5 word rows. Returns the block's bottom y.

        ``fixed_conf`` makes the block's confidences page-independent —
        used for repeated headers/footers so the same words survive the
        conf filter on every page (the repetition fixture contract)."""
        if not words:
            return y
        self.block += 1
        word_rows = []
        cursor = x
        line = 1
        word_in_line = 0
        max_right = x
        for widx, word in enumerate(words):
            wpx = _word_px(word)
            if cursor + wpx > x + wrap_width and word_in_line > 0:
                line += 1
                cursor = x
                word_in_line = 0
            top = y + (line - 1) * LINE_H + 3
            word_rows.append(
                self._row(
                    5, self.block, 1, line, word_in_line,
                    cursor, top, wpx, LINE_H - 8,
                    fixed_conf if fixed_conf is not None
                    else _conf(self.url, self.page, self.block, widx),
                    word,
                )
            )
            max_right = max(max_right, cursor + wpx)
            cursor += wpx + 14
            word_in_line += 1
        bbox_h = line * LINE_H
        self.rows.append(
            self._row(2, self.block, 0, 0, 0, x, y, max_right - x, bbox_h,
                      -1, "")
        )
        self.rows.extend(word_rows)
        return y + bbox_h


def _chunks(seq, size):
    return [seq[i:i + size] for i in range(0, len(seq), size)] or [[]]


def _split_even(seq, n):
    n = max(1, n)
    per = max(1, (len(seq) + n - 1) // n)
    parts = _chunks(seq, per)
    while len(parts) < n:
        parts.append([])
    return parts[:n]


def _fill_body(builder, words, x, wrap_width, y_start=500, y_stop=2800,
               words_per_block=30):
    y = y_start
    for block_words in _chunks(words, words_per_block):
        if not block_words or y >= y_stop:
            break
        y = builder.add_block(block_words, x, y, wrap_width) + BLOCK_GAP
    return y


def document_tokens(url: str, text: str, archetype: str) -> list:
    """Token rows for one document — pure function of its arguments."""
    words = [w for w in text.split() if w]
    if archetype == "columns":
        return _columns_doc(url, words)
    if archetype == "repeat_header":
        return _repeat_header_doc(url, words)
    if archetype == "quote":
        return _quote_doc(url, words)
    if archetype == "sheetno":
        return _sheetno_doc(url, words)
    if archetype == "news_image":
        return _news_doc(url, words)
    if archetype == "multipage_skew":
        return _skew_doc(url, words)
    return _plain_doc(url, words)


def _plain_doc(url, words):
    pages = []
    for page_idx, page_words in enumerate(_split_even(words, 1)):
        b = _PageBuilder(url, page_idx, A4_W, A4_H)
        _fill_body(b, page_words, MARGIN, A4_W - 2 * MARGIN)
        pages.append(b)
    return [row for b in pages for row in b.rows]


def _columns_doc(url, words):
    """Two-column layout exercising the greedy reading-order rewrite
    (app/util_ocr.py:527-614): column blocks interleave under the y-dominant
    sort and must be re-sequenced left-column-first."""
    b = _PageBuilder(url, 0, A4_W, A4_H)
    col_w = (A4_W - 2 * MARGIN - 100) // 2  # 890
    left_x = MARGIN
    right_x = MARGIN + col_w + 100
    left_words, right_words = _split_even(words, 2)
    ys = [500, 980, 1460, 1940, 2420]
    for col_x, col_words in ((left_x, left_words), (right_x, right_words)):
        for y, block_words in zip(ys, _split_even(col_words, len(ys))):
            if block_words:
                b.add_block(block_words, col_x, y, col_w)
    return b.rows


def _repeat_header_doc(url, words):
    """3 pages with identical header (top ¼, off-border) and footer
    (bottom ⅙, off-border) — exercises the cross-page repetition join
    (app/util_ocr.py:424-492)."""
    header = _bank_words(url, "hdr", 4)
    footer = _bank_words(url, "ftr", 3)
    parts = _split_even(words, 3)
    rows = []
    for page_idx in range(3):
        b = _PageBuilder(url, page_idx, A4_W, A4_H)
        b.add_block(header, 600, 400, 1400, fixed_conf=90)
        _fill_body(b, parts[page_idx], MARGIN, A4_W - 2 * MARGIN,
                   y_start=620, y_stop=2700)
        b.add_block(footer, 600, 2950, 1400, fixed_conf=90)
        rows.extend(b.rows)
    return rows


def _quote_doc(url, words):
    """Indented block at >= 5cm-equivalent left margin with no left
    neighbor → CT (app/util_ocr.py:410-415, 494-512)."""
    b = _PageBuilder(url, 0, A4_W, A4_H)
    quote = _bank_words(url, "qt", 14)
    body_top, body_bottom = _split_even(words, 2)
    _fill_body(b, body_top, MARGIN, A4_W - 2 * MARGIN,
               y_start=500, y_stop=850)
    b.add_block(quote, 700, 950, A4_W - 700 - MARGIN)
    _fill_body(b, body_bottom, MARGIN, A4_W - 2 * MARGIN,
               y_start=1450, y_stop=2800)
    return b.rows


def _sheetno_doc(url, words):
    """Corner sheet-number box (digits, ≤5 words, D+S borders → F) and a
    left-border stamp (→ E) (app/util_ocr.py:375-387)."""
    b = _PageBuilder(url, 0, A4_W, A4_H)
    sheet_no = str(12000 + _h(url, "folha") % 9000)
    b.add_block(["fls.", sheet_no], 2150, 120, 320)
    b.add_block([_WORD_BANK[_h(url, "stamp") % len(_WORD_BANK)][:8]],
                60, 1500, 260)
    _fill_body(b, words, MARGIN, A4_W - 2 * MARGIN)
    return b.rows


def _news_doc(url, words):
    """Single page with a centered first-box header (C rule,
    app/util_ocr.py:400-406) on a non-A4 page size; the Faixa variant
    crashes reference geometry → error side-output fixture."""
    pw, ph = _NEWS_PAGE_SIZES[_h(url, "size") % len(_NEWS_PAGE_SIZES)]
    b = _PageBuilder(url, 0, pw, ph)
    header = _bank_words(url, "hl", 3)
    laid_w = sum(_word_px(w) for w in header) + 14 * (len(header) - 1)
    b.add_block(header, max(0, (pw - laid_w) // 2), int(ph * 0.12), pw,
                fixed_conf=90)
    _fill_body(b, words, MARGIN, pw - 2 * MARGIN,
               y_start=int(ph * 0.22), y_stop=ph - 400)
    return b.rows


def _skew_doc(url, words):
    """One deliberately heavy multi-page doc (skew fixture): body words
    replicated over 12 pages."""
    heavy_words = (words * 8) or _bank_words(url, "pad", 64)
    parts = _split_even(heavy_words, 12)
    rows = []
    for page_idx in range(12):
        b = _PageBuilder(url, page_idx, A4_W, A4_H)
        _fill_body(b, parts[page_idx], MARGIN, A4_W - 2 * MARGIN)
        rows.extend(b.rows)
    return rows


def estimate_pages(archetype: str) -> int:
    """Cheap page-count estimate for skew-aware partitioning (the
    north_star's 'salted repartition by estimated page count')."""
    if archetype == "multipage_skew":
        return 12
    if archetype == "repeat_header":
        return 3
    return 1
