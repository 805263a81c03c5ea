"""End-to-end oracle tests over the synthetic fixture corpus: every
archetype exercises its reference rule (FIXTURES.md §3) and the output
invariants hold.
"""

import pytest

from servico_ocr_spark.core.geometry import FaixaGeometryError
from servico_ocr_spark.corpus import build_corpus, parse_payload
from servico_ocr_spark.pipeline import analyze_page_row

N_DOCS = 64


@pytest.fixture(scope="module")
def analyzed():
    corpus = build_corpus(N_DOCS)
    ok, errors = {}, {}
    for _, row in corpus.iterrows():
        try:
            ok[row["url"]] = analyze_page_row(row["url"], row["html"])
        except Exception as exc:
            errors[row["url"]] = exc
    return corpus, ok, errors


def _by_archetype(ok, archetype):
    return {u: r for u, r in ok.items() if f"/{archetype}/" in u}


def test_corrupt_docs_error(analyzed):
    corpus, ok, errors = analyzed
    corrupt = [u for u in corpus["url"] if "/corrupt/" in u]
    assert corrupt
    for url in corrupt:
        assert url in errors


def test_faixa_docs_error(analyzed):
    corpus, ok, errors = analyzed
    faixa_errors = [
        u for u, e in errors.items() if isinstance(e, FaixaGeometryError)
    ]
    news = [u for u in corpus["url"] if "/news_image/" in u]
    # every error'd news doc must be the Faixa geometry crash
    for u in news:
        assert u in ok or u in faixa_errors


def test_columns_reading_order(analyzed):
    _, ok, _ = analyzed
    docs = _by_archetype(ok, "columns")
    assert docs
    for res in docs.values():
        xs = [b["box_xyla"][0] for b in res["boxes"]]
        # left column (x=300) comes out fully before the right column
        first_right = next(i for i, x in enumerate(xs) if x > 1000)
        assert all(x > 1000 for x in xs[first_right:])


def test_repeat_header_detection(analyzed):
    _, ok, _ = analyzed
    docs = _by_archetype(ok, "repeat_header")
    assert docs
    for res in docs.values():
        reps = [b for b in res["boxes"] if b["tipo_sugerido"] == "Repetição"]
        kinds = {b["tipo"] for b in reps}
        assert "C" in kinds and "R" in kinds
        assert res["paginas"] == 3


def test_quote_detection(analyzed):
    _, ok, _ = analyzed
    docs = _by_archetype(ok, "quote")
    assert docs
    for res in docs.values():
        cts = [b for b in res["boxes"] if b["tipo"] == "CT"]
        assert cts and all(b["tipo_sugerido"] == "Margem" for b in cts)


def test_sheetno_detection(analyzed):
    _, ok, _ = analyzed
    docs = _by_archetype(ok, "sheetno")
    assert docs
    for res in docs.values():
        kinds = {b["tipo"] for b in res["boxes"]}
        assert "F" in kinds and "E" in kinds


def test_news_header(analyzed):
    _, ok, _ = analyzed
    docs = _by_archetype(ok, "news_image")
    for res in docs.values():
        first = res["boxes"][0]
        assert first["tipo"] == "C"
        assert res["pagina_tipo"] in {"Carta", "Legal", "Quadrado"}


def test_skew_doc_pages(analyzed):
    _, ok, _ = analyzed
    docs = _by_archetype(ok, "multipage_skew")
    assert docs
    for res in docs.values():
        assert res["paginas"] == 12


def test_spans_and_render_invariants(analyzed):
    _, ok, _ = analyzed
    for res in ok.values():
        text = res["extracted_text"]
        by_id = {b["id"]: b for b in res["boxes"]}
        for span in res["spans"]:
            assert text[span["start"]:span["end"]] == by_id[span["box_id"]]["texto"]
        assert [b["id"] for b in res["boxes"]] == list(range(len(res["boxes"])))
        # per-page box numbering restarts at 0 and is contiguous
        page, expect = None, 0
        for b in res["boxes"]:
            if b["pagina"] != page:
                page, expect = b["pagina"], 0
            assert b["box"] == expect
            expect += 1
        if res["boxes"]:
            assert "Página: 1" in res["md"]
            assert "Página: 1" in res["html_render"]


def test_determinism(analyzed):
    corpus, ok, _ = analyzed
    url = next(iter(ok))
    html = corpus.set_index("url").loc[url, "html"]
    again = analyze_page_row(url, html)
    assert again["extracted_text"] == ok[url]["extracted_text"]
    assert again["md"] == ok[url]["md"]
    assert again["boxes"] == ok[url]["boxes"]


def test_payload_roundtrip():
    corpus = build_corpus(4)
    row = corpus.iloc[0]
    payload = parse_payload(row["html"])
    assert payload["text"] == row["text"]
