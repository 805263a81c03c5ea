"""Schema contract for the production OCR boundary.

The binaries (tesseract/poppler) are absent in this sandbox, so
:func:`sources.ocr_engine.tesseract_tokens` is exercised with pytesseract/
pdf2image/PIL mocked at the module-import seam. What IS asserted is the
part that must never drift: the emitted rows match the synthetic
TokenSource contract (exact TOKEN_COLUMNS keys, int dtypes, str text) and
feed the real analysis kernel unchanged — so swapping the production
source in cannot break the tested downstream path.
"""

import sys
import types

import pytest

from servico_ocr_spark.core.analyze import TOKEN_COLUMNS, analyze_document
from servico_ocr_spark.core.tokenizer import document_tokens


class _FakeImage:
    def convert(self, mode):
        assert mode == "L"  # grayscale before OCR (app/util_ocr.py:81-87)
        return self


def _fake_tsv_dict():
    """pytesseract.image_to_data(..., output_type=DICT) shape: dict of
    parallel lists; conf arrives as strings/floats (version-dependent),
    which the boundary must coerce via int(float(...))."""
    words = ["casa", "rio", "foro"]
    n = 2 + len(words)
    return {
        "level": [1, 2] + [5] * len(words),
        "block_num": [0, 1] + [1] * len(words),
        "par_num": [0] * 2 + [1] * len(words),
        "line_num": [0] * 2 + [1] * len(words),
        "word_num": [0, 0] + list(range(1, len(words) + 1)),
        "left": [0, 100] + [100 + 80 * i for i in range(len(words))],
        "top": [0, 120] + [120] * len(words),
        "width": [1240, 400] + [70] * len(words),
        "height": [1754, 40] + [30] * len(words),
        "conf": ["-1", "-1"] + ["95.0"] * len(words),
        "text": ["", ""] + words,
    }


@pytest.fixture
def mocked_ocr_libs(monkeypatch):
    fake_pytesseract = types.ModuleType("pytesseract")
    fake_pytesseract.Output = types.SimpleNamespace(DICT="dict")

    def image_to_data(img, lang, output_type):
        assert lang == "por"
        assert output_type == "dict"
        assert isinstance(img, _FakeImage)
        return _fake_tsv_dict()

    fake_pytesseract.image_to_data = image_to_data

    fake_pil = types.ModuleType("PIL")
    fake_pil_image = types.ModuleType("PIL.Image")
    fake_pil_image.open = lambda buf: _FakeImage()
    fake_pil.Image = fake_pil_image

    fake_pdf2image = types.ModuleType("pdf2image")
    fake_pdf2image.convert_from_bytes = (
        lambda payload, dpi: [_FakeImage(), _FakeImage()]
    )

    monkeypatch.setitem(sys.modules, "pytesseract", fake_pytesseract)
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_pil_image)
    monkeypatch.setitem(sys.modules, "pdf2image", fake_pdf2image)


def test_tesseract_tokens_matches_synthetic_contract(mocked_ocr_libs):
    from servico_ocr_spark.sources.ocr_engine import tesseract_tokens

    got = tesseract_tokens(b"fake-image-bytes", kind="png")
    twin = document_tokens("https://example.test/plain/x", "casa rio foro",
                           "plain")
    assert got, "mocked OCR must emit rows"
    for row in got:
        assert list(row) == TOKEN_COLUMNS  # exact keys, exact order
    # dtype contract, column for column, against the synthetic twin
    for col in TOKEN_COLUMNS:
        got_t = {type(r[col]) for r in got}
        twin_t = {type(r[col]) for r in twin}
        assert got_t == twin_t == ({str} if col == "text" else {int}), (
            col, got_t, twin_t
        )


def test_tesseract_tokens_pdf_pages_increment(mocked_ocr_libs):
    from servico_ocr_spark.sources.ocr_engine import tesseract_tokens

    rows = tesseract_tokens(b"%PDF-fake", kind="pdf")
    assert sorted(set(r["page_num"] for r in rows)) == [0, 1]


def test_tesseract_tokens_feed_analysis_kernel(mocked_ocr_libs):
    """The production rows must flow through the real analysis kernel —
    the downstream everything-below-tokens path is source-agnostic."""
    from servico_ocr_spark.sources.ocr_engine import tesseract_tokens

    rows = tesseract_tokens(b"fake-image-bytes", kind="png")
    boxes, n_pages, conf_sum, conf_count = analyze_document(rows)
    assert n_pages == 1
    assert len(boxes) == 1
    assert boxes[0]["texto"] == "casa rio foro"
    assert conf_count == 3 and conf_sum == 95 * 3


def _real_ocr_stack_present() -> bool:
    """True only when BOTH the Python libs and the tesseract binary exist
    (probed at collection time, like the protobuf/iceberg gates)."""
    import importlib.util
    import shutil

    return (
        importlib.util.find_spec("pytesseract") is not None
        and importlib.util.find_spec("PIL") is not None
        and shutil.which("tesseract") is not None
    )


@pytest.mark.skipif(
    not _real_ocr_stack_present(),
    reason="real OCR stack (pytesseract + Pillow + tesseract binary) not "
    "installed in this environment",
)
def test_real_tesseract_smoke_png_through_kernel():
    """Real-binary smoke (VERDICT r2 item 7): render one PNG with actual
    Pillow, OCR it with the actual tesseract binary, and flow the rows
    through the analysis kernel. Asserts schema + non-empty boxes only —
    NOT byte-identity, because real OCR output varies across tesseract
    versions/models."""
    import io
    import subprocess

    from PIL import Image, ImageDraw

    from servico_ocr_spark.sources.ocr_engine import tesseract_tokens

    img = Image.new("RGB", (600, 120), "white")
    ImageDraw.Draw(img).text((20, 40), "CASA RIO FORO", fill="black")
    buf = io.BytesIO()
    img.save(buf, format="PNG")

    langs = subprocess.run(
        ["tesseract", "--list-langs"], capture_output=True, text=True
    ).stdout
    lang = "por" if "por" in langs.split() else "eng"

    rows = tesseract_tokens(buf.getvalue(), kind="png", lang=lang)
    assert rows, "real tesseract must emit at least structural rows"
    for row in rows:
        assert list(row) == TOKEN_COLUMNS
    boxes, n_pages, _, conf_count = analyze_document(rows)
    assert n_pages == 1
    assert boxes, "a rendered text line must yield at least one box"
    assert conf_count > 0


def test_tesseract_tokens_raises_without_libs():
    """Without the OCR stack the boundary must fail loudly, not return
    empty tokens (ocr_engine.py import gate)."""
    from servico_ocr_spark.sources.ocr_engine import tesseract_tokens

    assert "pytesseract" not in sys.modules
    with pytest.raises(NotImplementedError, match="pytesseract"):
        tesseract_tokens(b"bytes", kind="png")
