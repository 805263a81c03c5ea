"""Sources and sinks.

- :mod:`.ocr_engine` — the production TokenSource (pytesseract + pdf2image
  behind an import gate; the reference's subprocess boundaries at
  app/util_ocr.py:102 and app/util_pdf_ocr.py:26-31).
- :func:`read_pages` / :func:`read_binary_files` — input scans.
- :mod:`.warc` — WARC (ISO 28500) record splitting, Common Crawl's
  container format (:func:`.warc.read_warc_records`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .warc import read_warc_records  # noqa: F401


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """Scan the Common-Crawl-style pages table (parquet/Iceberg path).

    Column pruning matters at 100 TB: callers select only (url, html) for
    extraction so the `text`/`lang` columns never leave the scan.
    """
    return spark.read.parquet(path)


def read_binary_files(spark: SparkSession, path: str,
                      glob: str = "*.{pdf,png,jpg,jpeg,tif,tiff}") -> DataFrame:
    """File-drop ingestion (the reference's entrada folder,
    app/util_processar_pasta.py:276-289) as a binaryFile scan:
    (path, modificationTime, length, content)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .selectExpr(
            "path AS url",
            "modificationTime AS warc_ts",
            "content AS html",
            "CAST(NULL AS STRING) AS text",
            "'por' AS lang",
        )
    )
