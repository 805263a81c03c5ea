"""S9/S10 artifact sink: real Spark plumbing, reference keep-rule, stubbed
binary renderers (SURVEY §2.1 S9/S10; app/util_pdf_ocr.py:34-63,
app/util_pdf_compress.py:56-92)."""

import hashlib
import os
import zlib

from servico_ocr_spark.corpus import build_corpus
from servico_ocr_spark.pipeline import run_extraction
from servico_ocr_spark.schemas import PAGES_SCHEMA
from servico_ocr_spark.sources.artifact_sink import (
    compress_artifact,
    stub_searchable_pdf,
    write_artifacts,
)


def test_compress_ratio_rule():
    text = b"%PDF-STUB-1.4\n" + b"palavra repetida " * 200
    compressed, ratio = compress_artifact(text)
    assert ratio > 0 and len(compressed) < len(text)
    assert zlib.decompress(compressed) == text
    # high-entropy bytes don't compress: the sink must keep the original
    entropy = b"".join(
        hashlib.sha256(bytes([i])).digest() for i in range(64)
    )
    _, ratio2 = compress_artifact(entropy)
    assert ratio2 <= 0


def test_artifact_sink_end_to_end(spark, tmp_path):
    pages = spark.createDataFrame(build_corpus(16), schema=PAGES_SCHEMA)
    analysis = run_extraction(pages, num_partitions=4)
    out_dir = str(tmp_path / "artifacts")
    manifest = write_artifacts(analysis, out_dir).collect()

    ok_urls = [
        r["url"] for r in analysis.select("url", "status").collect()
        if r["status"] == "ok"
    ]
    assert sorted(m["url"] for m in manifest) == sorted(ok_urls)
    for m in manifest:
        assert m["artifact"] == hashlib.md5(m["url"].encode()).hexdigest() + ".pdf"
        path = os.path.join(out_dir, m["artifact"])
        data = open(path, "rb").read()
        assert len(data) == m["n_bytes"]
        raw = zlib.decompress(data) if m["compressed"] else data
        assert raw.startswith(b"%PDF-STUB-1.4")
        assert m["url"].encode() in raw
        assert ("compactado" in m["note"]) == m["compressed"]

    # idempotent rerun: same artifact bytes, same manifest size
    before = {
        f: open(os.path.join(out_dir, f), "rb").read()
        for f in os.listdir(out_dir)
    }
    manifest2 = write_artifacts(analysis, out_dir).collect()
    after = {
        f: open(os.path.join(out_dir, f), "rb").read()
        for f in os.listdir(out_dir)
    }
    assert before == after and len(manifest2) == len(manifest)


def test_stub_render_deterministic():
    boxes = [
        {"pagina": 0, "box": 0, "tipo": "P", "texto": "um parágrafo"},
        {"pagina": 1, "box": 0, "tipo": "T", "texto": "título"},
    ]
    a = stub_searchable_pdf("https://x/doc", boxes, 2)
    b = stub_searchable_pdf("https://x/doc", boxes, 2)
    assert a == b and a.endswith(b"%%EOF")
