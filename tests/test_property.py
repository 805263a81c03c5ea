"""Property-based fuzzing of the per-document kernel (hypothesis).

The greedy column rewrite and the renumber/classify passes are the
sequential hard parts (SURVEY.md §7.3); these properties must hold for ANY
token stream, not just the fixture archetypes:

- analysis never crashes on arbitrary layouts (except the replicated Faixa
  geometry error);
- no box is lost or duplicated by sorting/column-rewrite;
- ids are contiguous globally, box ordinals contiguous per page;
- spans reconstruct extracted_text exactly;
- the whole kernel is a pure function (same input → same output).
"""

from hypothesis import given, settings, strategies as st

from servico_ocr_spark.core.analyze import (
    assemble_boxes,
    assemble_text,
    enrich,
)
from servico_ocr_spark.core.geometry import FaixaGeometryError

_WORDS = ["casa", "ação", "rio", "12", "justiça", "a", "foro", "nº",
          "relatório", "x1"]


@st.composite
def token_streams(draw):
    n_pages = draw(st.integers(1, 3))
    page_w = draw(st.sampled_from([2480, 2550, 2000, 1600]))
    page_h = draw(st.sampled_from([3508, 3300, 2000, 4200]))
    rows = []
    for page in range(n_pages):
        rows.append(dict(level=1, page_num=page, block_num=0, par_num=0,
                         line_num=0, word_num=0, left=0, top=0, width=page_w,
                         height=page_h, conf=-1, text=""))
        n_blocks = draw(st.integers(0, 6))
        for block in range(1, n_blocks + 1):
            x = draw(st.integers(0, page_w - 200))
            y = draw(st.integers(0, page_h - 120))
            bw = draw(st.integers(50, page_w - x))
            bh = draw(st.integers(40, 400))
            rows.append(dict(level=2, page_num=page, block_num=block,
                             par_num=0, line_num=0, word_num=0, left=x,
                             top=y, width=bw, height=bh, conf=-1, text=""))
            n_words = draw(st.integers(0, 8))
            for w in range(n_words):
                rows.append(dict(
                    level=5, page_num=page, block_num=block,
                    par_num=draw(st.integers(1, 2)),
                    line_num=draw(st.integers(1, 4)), word_num=w,
                    left=x + 10 * w, top=y + 3, width=80, height=40,
                    conf=draw(st.integers(-1, 99)),
                    text=draw(st.sampled_from(_WORDS)),
                ))
    return rows


@given(token_streams())
@settings(max_examples=150, deadline=None)
def test_kernel_invariants(rows):
    boxes, conf_sum, conf_count = assemble_boxes(list(rows))
    texts_before = sorted(b["texto"] for b in boxes)
    try:
        enriched, n_pages = enrich(boxes)
    except FaixaGeometryError:
        return  # replicated reference crash — routed to error side-output
    # conservation: sorting + column rewrite lose/duplicate nothing
    assert sorted(b["texto"] for b in enriched) == texts_before
    # contiguous global ids
    assert [b["id"] for b in enriched] == list(range(len(enriched)))
    # per-page ordinals restart at 0 and are contiguous
    page, expect = None, 0
    for b in enriched:
        if b["pagina"] != page:
            page, expect = b["pagina"], 0
        assert b["box"] == expect
        expect += 1
    # every box classified
    assert all(b["tipo"] in {"P", "C", "R", "T", "F", "E", "CT"}
               for b in enriched)
    # spans reconstruct the text
    text, spans = assemble_text(enriched)
    by_id = {b["id"]: b for b in enriched}
    for span in spans:
        assert text[span["start"]:span["end"]] == by_id[span["box_id"]]["texto"]


@given(token_streams())
@settings(max_examples=50, deadline=None)
def test_kernel_is_pure(rows):
    def run(r):
        boxes, _, _ = assemble_boxes([dict(x) for x in r])
        try:
            enriched, _ = enrich(boxes)
        except FaixaGeometryError:
            return "FAIXA"
        return [(b["id"], b["texto"], b["tipo"], tuple(b["box_xyla"]))
                for b in enriched]

    assert run(rows) == run(rows)
