"""Page-geometry classification (reference class ``Pagina``).

Parity: app/util_ocr.py:621-676. Given a page size in pixels, pick the
best-matching paper format by aspect ratio and expose the margin fractions
used by border/region classification.

Replicated quirk: the ``Faixa`` branch of the reference reads
``self.proporcao`` which is never assigned (app/util_ocr.py:661), so any
page whose aspect ratio lands in the Faixa band raises ``AttributeError``
and the whole document fails over to the error path. We raise
:class:`FaixaGeometryError` so the pipeline can route the document to the
lineage error side-output exactly like the reference's error folder
(app/util_processar_pasta.py:412-421).
"""

from __future__ import annotations


class FaixaGeometryError(RuntimeError):
    """Reference AttributeError at app/util_ocr.py:661 (Faixa pages crash)."""


class PageGeometry:
    A4_W, A4_H = 21.0, 29.7
    CARTA_W, CARTA_H = 21.59, 27.94
    LEGAL_W, LEGAL_H = 21.59, 35.56
    SQUARE_W, SQUARE_H = 20.0, 20.0
    BAND_W, BAND_H = 20.0, 10.0

    def __init__(self, page_w: float, page_h: float) -> None:
        ratio = page_w / page_h
        # Priority order and inclusive bands exactly as app/util_ocr.py:636-670
        if 20.5 <= ratio * self.A4_H <= 21.5:
            w, h = (self.A4_W, self.A4_H) if ratio < 1 else (self.A4_H, self.A4_W)
            self.kind = "A4"
        elif 20.09 <= ratio * self.CARTA_H <= 22.09:
            w, h = (self.CARTA_W, self.CARTA_H) if ratio < 1 else (self.CARTA_H, self.CARTA_W)
            self.kind = "Carta"
        elif 20.50 <= ratio * self.LEGAL_H <= 22.09:
            w, h = (self.LEGAL_W, self.LEGAL_H) if ratio < 1 else (self.LEGAL_H, self.LEGAL_W)
            self.kind = "Legal"
        elif 19.5 <= ratio * self.SQUARE_H <= 20.5:
            w, h = (self.SQUARE_W, self.SQUARE_H) if ratio < 1 else (self.SQUARE_H, self.SQUARE_W)
            self.kind = "Quadrado"
        elif 19.5 <= ratio * self.BAND_H <= 20.5:
            # app/util_ocr.py:661 reads the nonexistent ``self.proporcao``:
            # every Faixa-proportioned page crashes document analysis.
            raise FaixaGeometryError(
                "Faixa-proportioned page crashes reference analysis "
                "(AttributeError: 'Pagina' object has no attribute 'proporcao', "
                "app/util_ocr.py:661)"
            )
        else:
            w, h = (self.A4_W, self.A4_H) if ratio < 1 else (self.A4_H, self.A4_W)
            self.kind = "A4"

        # app/util_ocr.py:672-676 — margin fractions in page units
        self.header_margin = 3 / h
        self.side_margin = 3 / w
        self.footer_margin = 2.5 / h
        self.stamp_margin = 2.5 / w
        self.quote_margin = 5 / w
