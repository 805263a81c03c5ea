"""Unit tests of the pure-Python kernel against hand-computed goldens.

Each test pins one reference behavior (file:line cited in the module under
test), including the deliberately-replicated quirks.
"""

from servico_ocr_spark.core.analyze import (
    CONF_LIMIT,
    _classify_borders,
    _classify_title_quote,
    assemble_boxes,
    assemble_text,
    enrich,
)
from servico_ocr_spark.core.geometry import FaixaGeometryError, PageGeometry
from servico_ocr_spark.core.text import (
    collapse_box_text,
    fold_accents_symbols,
    rejoin_broken_paragraphs,
)

import pytest


# --- X1/X2 normalization ---------------------------------------------------

def test_fold_accents_symbols():
    assert fold_accents_symbols("Ação é João!") == "acao e joao "
    # only the seven groups fold; ý is stripped, not folded
    assert fold_accents_symbols("ý") == " "
    assert fold_accents_symbols("ABC-123") == "abc 123"


def test_collapse_is_one_pass():
    # app/util_ocr.py:117 — a triple space collapses to double, not single
    assert collapse_box_text("a   b") == "a  b"
    assert collapse_box_text("  a  b  ") == "a b"


# --- X3 paragraph rejoin ----------------------------------------------------

def test_rejoin_broken_paragraphs():
    assert rejoin_broken_paragraphs("linha um\ncontinua") == ["linha um continua"]
    assert rejoin_broken_paragraphs("fim.\nNova frase") == ["fim.", "Nova frase"]
    # abbreviation before the period keeps joining (app/util.py:217-218)
    assert rejoin_broken_paragraphs("ver art.\nseguinte") == ["ver art. seguinte"]


# --- X5 page geometry -------------------------------------------------------

def test_page_geometry_kinds():
    assert PageGeometry(2480, 3508).kind == "A4"
    assert PageGeometry(2550, 3300).kind == "Carta"
    assert PageGeometry(2550, 4200).kind == "Legal"
    assert PageGeometry(2000, 2000).kind == "Quadrado"
    with pytest.raises(FaixaGeometryError):
        PageGeometry(2000, 1000)  # app/util_ocr.py:661 AttributeError quirk


# --- A1/F1 box assembly -----------------------------------------------------

def _tok(level, page, block, par, line, word, left, top, w, h, conf, text):
    return dict(level=level, page_num=page, block_num=block, par_num=par,
                line_num=line, word_num=word, left=left, top=top, width=w,
                height=h, conf=conf, text=text)


def test_assembly_conf_filter_and_lines():
    rows = [
        _tok(1, 0, 0, 0, 0, 0, 0, 0, 2480, 3508, -1, ""),
        _tok(2, 0, 1, 0, 0, 0, 300, 500, 400, 112, -1, ""),
        _tok(5, 0, 1, 1, 1, 0, 300, 503, 100, 48, 95, "ola"),
        _tok(5, 0, 1, 1, 1, 1, 410, 503, 100, 48, 10, "ruido"),  # dropped
        _tok(5, 0, 1, 1, 2, 0, 300, 559, 100, 48, 80, "mundo"),
    ]
    boxes, conf_sum, conf_count = assemble_boxes(rows)
    assert len(boxes) == 1
    box = boxes[0]
    assert box["texto"] == "ola mundo"
    assert box["qtd_linhas"] == 2  # line change counted on accepted words
    assert box["box_xyla"] == [300, 500, 400, 112]
    assert box["pagina_la"] == [2480, 3508]
    assert conf_count == 2 and conf_sum == 175
    assert CONF_LIMIT == 30


def test_assembly_drops_empty_boxes():
    rows = [
        _tok(1, 0, 0, 0, 0, 0, 0, 0, 2480, 3508, -1, ""),
        _tok(2, 0, 1, 0, 0, 0, 300, 500, 400, 56, -1, ""),
        _tok(5, 0, 1, 1, 1, 0, 300, 503, 100, 48, 5, "lixo"),  # under conf
    ]
    boxes, _, _ = assemble_boxes(rows)
    assert boxes == []


# --- C-rules ---------------------------------------------------------------

def _box(**kw):
    base = dict(
        pagina=0, box=1, pagina_la=[2480, 3508], box_xyla=[300, 500, 400, 56],
        qtd_linhas=1, qtd_palavras=3, qtd_letras=10, alt_linhas=56,
        alt_linhas_med=56, qtd_boxes=3, texto="abc", bordas=[], tipo="",
        tipo_sugerido="", palavras={"abc"},
    )
    base.update(kw)
    return base


def test_footer_rule():
    box = _box(bordas=["I"], qtd_palavras=40)
    assert _classify_borders(box)
    assert box["tipo"] == "R" and box["tipo_sugerido"] == "Bordas"


def test_sheet_overrides_footer():
    box = _box(bordas=["D", "I"], qtd_palavras=2, texto="fls 123")
    assert _classify_borders(box)
    assert box["tipo"] == "F"


def test_stamp_precedence_quirk():
    # app/util_ocr.py:384-385: E-border alone qualifies regardless of words
    box = _box(bordas=["E"], qtd_palavras=500)
    assert _classify_borders(box)
    assert box["tipo"] == "E"
    # D-border respects the 30-word cap
    box2 = _box(bordas=["D"], qtd_palavras=500)
    assert not _classify_borders(box2)


def test_header_rule_first_box_only():
    geom = PageGeometry(2480, 3508)
    box = _box(box=0, box_xyla=[700, 380, 800, 56], qtd_palavras=3)
    assert _classify_title_quote(box, geom, [box])
    assert box["tipo"] == "C" and box["tipo_sugerido"] == "Proporção e margem"
    box2 = _box(box=1, box_xyla=[700, 380, 800, 56])
    assert not _classify_title_quote(box2, geom, [box2])


def test_dead_title_rule():
    # app/util_ocr.py:417-421: for 1-line boxes h > round(h)*1.15 never holds
    geom = PageGeometry(2480, 3508)
    box = _box(box=3, box_xyla=[300, 1500, 400, 56], qtd_linhas=1)
    _classify_title_quote(box, geom, [box])
    assert box["tipo"] != "T"


# --- enrichment end-to-end on a handcrafted page -----------------------------

def test_enrich_margins_and_order():
    rows = [
        _tok(1, 0, 0, 0, 0, 0, 0, 0, 2480, 3508, -1, ""),
        _tok(2, 0, 1, 0, 0, 0, 300, 1000, 400, 56, -1, ""),
        _tok(5, 0, 1, 1, 1, 0, 300, 1003, 100, 48, 90, "baixo"),
        _tok(2, 0, 2, 0, 0, 0, 300, 500, 400, 56, -1, ""),
        _tok(5, 0, 2, 1, 1, 0, 300, 503, 100, 48, 90, "cima"),
    ]
    boxes, _, _ = assemble_boxes(rows)
    boxes, n_pages = enrich(boxes)
    assert n_pages == 1
    assert [b["texto"] for b in boxes] == ["cima", "baixo"]  # y-order
    assert [b["id"] for b in boxes] == [0, 1]
    assert [b["box"] for b in boxes] == [0, 1]
    top = boxes[0]
    # margins: left edge candidates < 300 are none (0 not collected here);
    # e == x; top margin to page; bottom margin to the lower box minus 1
    assert top["margens_edsi"][0] == 300
    assert top["margens_edsi"][2] == 500
    assert top["margens_edsi"][3] == 1000 - (500 + 56) - 1
    assert top["pagina_tipo"] == "A4"
    assert "ordem_extra" not in top and "palavras" not in top


def test_spans_invariant():
    rows = [
        _tok(1, 0, 0, 0, 0, 0, 0, 0, 2480, 3508, -1, ""),
        _tok(2, 0, 1, 0, 0, 0, 300, 500, 400, 56, -1, ""),
        _tok(5, 0, 1, 1, 1, 0, 300, 503, 100, 48, 90, "um"),
        _tok(2, 0, 2, 0, 0, 0, 300, 700, 400, 56, -1, ""),
        _tok(5, 0, 2, 1, 1, 0, 300, 703, 100, 48, 90, "dois"),
    ]
    boxes, _, _ = assemble_boxes(rows)
    boxes, _ = enrich(boxes)
    text, spans = assemble_text(boxes)
    assert text == "um\n\ndois"
    for box, span in zip(boxes, spans):
        assert text[span["start"]:span["end"]] == box["texto"]
