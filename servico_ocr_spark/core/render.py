"""Box list → Markdown / HTML renders + region filtering.

Parity: app/util_markdown.py:12-154, app/util_html.py:12-177,
app/app_controller.py:127-139 (filtrar_dados). The renders consume the
final enriched reading-order box list and route each box into one of the
nine page regions (folha/cabecalho/folha, estampa/textos/estampa,
folha/rodape/folha).

Deliberate deviation: the reference joins HTML tooltip reasons with
``'\\n'.join(set(v))`` (app/util_html.py:111) whose order depends on
Python hash randomization; we sort the set so output is byte-stable
across executors and runs.
"""

from __future__ import annotations

from .text import rejoin_broken_paragraphs

REGION_KEYS = [
    "cabecalho", "folhase", "folhasd",
    "estampas_e", "estampas_d", "textos",
    "rodape", "folhaie", "folhaid",
]


def filter_regions(boxes, keep_header=False, keep_stamps=False,
                   keep_quotes=True):
    """app/app_controller.py:127-139 — drop C/R unless keep_header, E/F
    unless keep_stamps, CT unless keep_quotes."""
    if keep_header and keep_stamps and keep_quotes:
        return list(boxes)
    out = []
    for box in boxes:
        t = box["tipo"]
        if t in {"C", "R"} and not keep_header:
            continue
        elif t in ("E", "F") and not keep_stamps:
            continue
        elif t == "CT" and not keep_quotes:
            continue
        out.append(box)
    return out


def _route_box(box, regions, tooltips, rendered):
    """Shared 9-region routing (app/util_markdown.py:112-139 ==
    app/util_html.py:131-160)."""
    t = box["tipo"]
    borders = box["bordas"]
    if t == "F":
        if "E" in borders and "S" in borders:
            slot = "folhase"
        elif "D" in borders and "S" in borders:
            slot = "folhasd"
        elif "E" in borders and "I" in borders:
            slot = "folhaie"
        elif "D" in borders and "I" in borders:
            slot = "folhaid"
        else:
            return
        regions[slot].append(rendered)
        tooltips[slot].append(box["tipo_sugerido"])
    elif t == "E":
        if "D" in borders:
            regions["estampas_d"].append(rendered)
            tooltips["estampas_d"].append(box["tipo_sugerido"])
        elif "E" in borders:
            regions["estampas_e"].append(rendered)
            tooltips["estampas_e"].append(box["tipo_sugerido"])
    elif t == "C":
        regions["cabecalho"].append(rendered)
        tooltips["cabecalho"].append(box["tipo_sugerido"])
    elif t == "R":
        regions["rodape"].append(rendered)
        tooltips["rodape"].append(box["tipo_sugerido"])
    elif box["texto"]:
        regions["textos"].append(rendered)


def _empty_regions():
    return {k: [] for k in REGION_KEYS}


# ---------------------------------------------------------------------------
# Markdown (app/util_markdown.py)
# ---------------------------------------------------------------------------

def _md_labeled(label, slot):
    return f"> <sub><b>{label}</b>: @@{slot}@@ </sub>\n"


def _md_header_template(regions):
    """get_modelo_texto (app/util_markdown.py:15-34), incl. the 'Rstampa'
    typo in the left-stamp label."""
    text = ""
    brk = ""
    if any(regions["cabecalho"]):
        text += ">@@cabecalho@@\n"
        brk = "\n"
    if any(regions["folhase"]):
        text += _md_labeled("Folha esquerda", "folhase")
        brk = "\n"
    if any(regions["folhasd"]):
        text += _md_labeled("Folha direita", "folhasd")
        brk = "\n"
    if any(regions["estampas_e"]):
        text += _md_labeled("Rstampa esquerda", "estampas_e")
        brk = "\n"
    if any(regions["estampas_d"]):
        text += _md_labeled("Estampa direita", "estampas_d")
        brk = "\n"
    text = f"{brk}{text}{brk}\n@@textos@@\n"
    return f"{text}\n"


def _md_footer_template(regions):
    """get_rodape (app/util_markdown.py:36-46)."""
    if not (any(regions["folhaie"]) or any(regions["folhaid"])
            or any(regions["rodape"])):
        return ""
    text = ""
    if any(regions["rodape"]):
        text = ">@@rodape@@\n"
    if any(regions["folhaie"]):
        text += _md_labeled("Estampa esquerda", "folhaie")
    if any(regions["folhaid"]):
        text += _md_labeled("Estampa direita", "folhaid")
    return text


_MD_QUOTE = "\n> @@texto@@\n"


def box_to_md(box):
    """box_2_md (app/util_markdown.py:146-154)."""
    if box["tipo"] == "T":
        return "<b>" + box["texto"] + "</b>"
    joined = "\n".join(rejoin_broken_paragraphs(str(box["texto"]).split("\n")))
    if box["tipo"] == "CT":
        return _MD_QUOTE.replace("@@texto@@", joined.replace("\n", ">\n"))
    return joined


def render_markdown(boxes):
    """aimg_2_md (app/util_markdown.py:49-142)."""
    page = 0
    regions = _empty_regions()
    tooltips = _empty_regions()
    pages_out: list = []

    def flush_page(regs):
        text = _md_header_template(regs) + _md_footer_template(regs)
        if not text:
            return
        for key, vals in regs.items():
            sep = "\n>" if key in ("cabecalho", "rodape") else "\n"
            v = sep.join(vals) if any(vals) else ""
            # unescape-then-escape square brackets (:87)
            v = (str(v).replace("\\[", "[").replace("\\]", "]")
                 .replace("[", "\\[").replace("]", "\\]"))
            text = text.replace(f"@@{key}@@", f"{v}")
        while text.find("\n\n\n") >= 0:
            text = text.replace("\n\n\n", "\n\n")
        text = (
            f"<sub><mark>Página: {len(pages_out)+1}</mark></sub>{text}"
        )
        pages_out.append(text)

    for box in boxes:
        if page != box["pagina"]:
            flush_page(regions)
            page = box["pagina"]
            regions = _empty_regions()
            tooltips = _empty_regions()
        _route_box(box, regions, tooltips, box_to_md(box))
    flush_page(regions)
    return "\n<hr>\n".join(pages_out)


# ---------------------------------------------------------------------------
# HTML (app/util_html.py)
# ---------------------------------------------------------------------------

_HTML_TOP = '''
            <div class="container-fluid">
                <div class="row">
                   <div class="col-md-1 font-weight-light bg-light text-sm-left border-secondary"> 
                        <span class="d-inline-block" tabindex="0" data-toggle="tooltip" title="@@folhase_tt@@">
                        @@folhase@@
                        </span>
                   </div>
                   <div class="col-md-10 font-weight-light bg-light text-sm-left">
                        <span class="d-inline-block" data-toggle="tooltip" title="@@cabecalho_tt@@">
                        @@cabecalho@@
                        </span>
                   </div>
                   <div class="col-md-1 font-weight-light bg-light text-sm-left border-secondary"> 
                        <span class="d-inline-block" tabindex="0" data-toggle="tooltip" title="@@folhasd_tt@@">
                        @@folhasd@@
                        </span>
                   </div>
                </div>
                '''
_HTML_MIDDLE = '''
                <div class="row">
                   <div class="col-md-1 border-right font-weight-light bg-light text-sm-left text-justify" >
                        <span class="d-inline-block" tabindex="0" data-toggle="tooltip" title="@@estampas_e_tt@@">
                        @@estampas_e@@
                        </span>
                   </div>
                   <div class="col-md-10 text-justify">
                        @@textos@@
                   </div>
                   <div class="col-md-1 border-left font-weight-light bg-light text-sm-left text-justify">
                        <span class="d-inline-block" tabindex="0" data-toggle="tooltip" title="@@estampas_d_tt@@">
                        @@estampas_d@@
                        </span>
                   </div>
                </div>
                '''
_HTML_TEXT_ONLY = '''<div class="col-md-10 text-justify">
                        @@textos@@
                   </div>
                '''
_HTML_BOTTOM = '''
                <div class="row">
                   <div class="col-md-1 font-weight-light bg-light text-sm-left border-secondary"> 
                        <span class="d-inline-block" tabindex="0" data-toggle="tooltip" title="@@folhaie_tt@@">
                        @@folhaie@@
                        </span>
                   </div>
                   <div class="col-md-10 font-weight-light bg-light text-sm-left">
                        <span class="d-inline-block" tabindex="0" data-toggle="tooltip" title="@@rodape_tt@@">
                        @@rodape@@
                        </span>
                   </div>
                   <div class="col-md-1 font-weight-light bg-light text-sm-left border-secondary"> 
                        <span class="d-inline-block" tabindex="0" data-toggle="tooltip" title="@@folhaid_tt@@">
                        @@folhaid@@
                        </span>
                   </div>
                </div>
            </div>
            '''

_HTML_QUOTE = '''\n<div class="container-fluid text-justify">
                          <div class="row">
                              <div class="col-md-3 "></div>
                              <div class="col-md-9 border-left font-weight-light font-italic text-sm-left"> @@texto@@ </div>
                          </div>
                    </div>'''


def box_to_html(box):
    """box_2_html (app/util_html.py:169-177)."""
    if box["tipo"] == "T":
        return "<b>" + box["texto"] + "</b>"
    joined = "\n".join(rejoin_broken_paragraphs(str(box["texto"]).split("\n")))
    if box["tipo"] == "CT":
        return _HTML_QUOTE.replace("@@texto@@", joined)
    return joined


def render_html(boxes):
    """aimg_2_html (app/util_html.py:74-161)."""
    page = 0
    regions = _empty_regions()
    tooltips = _empty_regions()
    pages_out: list = []

    def flush_page(regs, tips):
        text = ""
        if any(regs["cabecalho"]) or any(regs["folhase"]) or any(regs["folhasd"]):
            text += _HTML_TOP
        if any(regs["estampas_e"]) or any(regs["estampas_d"]):
            text += _HTML_MIDDLE
        else:
            text += _HTML_TEXT_ONLY
        if any(regs["rodape"]) or any(regs["folhaie"]) or any(regs["folhaid"]):
            text += _HTML_BOTTOM
        if not text:
            return
        for key, vals in regs.items():
            v = "\n<p>".join(vals) if any(vals) else ""
            text = text.replace(f"@@{key}@@", f"{v}")
        for key, vals in tips.items():
            # sorted() is our determinism fix over the reference's set()
            v = "\n".join(sorted(set(vals))) if any(vals) else ""
            v = f"Motivo da região: {v}" if v else ""
            text = text.replace(f"@@{key}_tt@@", f"{v}")
        text = (
            '<div class="container-fluid" style="text-align:right;height:12px;">'
            f"<sub><mark>Página: {len(pages_out)+1}</mark></sub></div>{text}"
        )
        pages_out.append(text)

    for box in boxes:
        if page != box["pagina"]:
            flush_page(regions, tooltips)
            page = box["pagina"]
            regions = _empty_regions()
            tooltips = _empty_regions()
        _route_box(box, regions, tooltips, box_to_html(box))
    flush_page(regions, tooltips)
    return "<hr>".join(pages_out)
