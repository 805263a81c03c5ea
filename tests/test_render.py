"""Render-parity unit tests (X10-X12) on handcrafted box lists — exact
output fragments per app/util_markdown.py / app/util_html.py semantics."""

from servico_ocr_spark.core.render import (
    box_to_html,
    box_to_md,
    filter_regions,
    render_html,
    render_markdown,
)


def _box(tipo, texto, bordas=(), pagina=0, sugerido="Bordas"):
    return {
        "pagina": pagina, "tipo": tipo, "texto": texto,
        "bordas": list(bordas), "tipo_sugerido": sugerido,
    }


def test_title_box_bold():
    assert box_to_md(_box("T", "Um Título")) == "<b>Um Título</b>"
    assert box_to_html(_box("T", "Um Título")) == "<b>Um Título</b>"


def test_quote_box_md_blockquote():
    md = box_to_md(_box("CT", "linha um\nlinha dois."))
    # paragraph re-join merges the unterminated line, then the quote
    # template indents (app/util_markdown.py:145-151)
    assert md == "\n> linha um linha dois.\n"


def test_quote_box_md_keeps_terminated_lines():
    md = box_to_md(_box("CT", "Fim da frase.\nOutra linha"))
    assert md == "\n> Fim da frase.>\nOutra linha\n"


def test_paragraph_rejoin_in_md():
    md = box_to_md(_box("P", "continua na\npróxima linha"))
    assert md == "continua na próxima linha"


def test_md_bracket_escaping():
    # unescape-then-escape (app/util_markdown.py:87)
    boxes = [_box("P", "veja [nota] e \\[já escapada\\]")]
    md = render_markdown(boxes)
    assert "veja \\[nota\\] e \\[já escapada\\]" in md


def test_nine_region_routing_md():
    boxes = [
        _box("C", "cabecalho texto"),
        _box("F", "fls 12", bordas=("D", "S")),
        _box("E", "estampa esq", bordas=("E",)),
        _box("P", "corpo do documento."),
        _box("R", "rodape texto", bordas=("I",)),
        _box("F", "fls 13", bordas=("E", "I")),
    ]
    md = render_markdown(boxes)
    assert ">cabecalho texto" in md
    assert "<b>Folha direita</b>: fls 12" in md
    assert "<b>Rstampa esquerda</b>: estampa esq" in md  # reference typo kept
    assert "corpo do documento." in md
    assert ">rodape texto" in md
    assert "<b>Estampa esquerda</b>: fls 13" in md
    assert md.startswith("<sub><mark>Página: 1</mark></sub>")


def test_nine_region_routing_html_tooltips():
    boxes = [
        _box("C", "cab", sugerido="Proporção e margem"),
        _box("P", "corpo."),
        _box("R", "rod", bordas=("I",), sugerido="Repetição"),
    ]
    html = render_html(boxes)
    assert "Motivo da região: Proporção e margem" in html
    assert "Motivo da região: Repetição" in html
    assert 'Página: 1' in html


def test_page_break_emits_hr():
    boxes = [_box("P", "pagina zero."), _box("P", "pagina um.", pagina=1)]
    md = render_markdown(boxes)
    assert "\n<hr>\n" in md
    assert "Página: 2" in md
    html = render_html(boxes)
    assert "<hr>" in html


def test_filter_regions_flags():
    boxes = [
        _box("C", "c"), _box("R", "r"), _box("E", "e"),
        _box("F", "f"), _box("CT", "ct"), _box("P", "p"),
    ]
    kept = filter_regions(boxes)  # defaults: drop C/R/E/F, keep CT
    assert [b["tipo"] for b in kept] == ["CT", "P"]
    all_kept = filter_regions(boxes, True, True, True)
    assert len(all_kept) == 6
