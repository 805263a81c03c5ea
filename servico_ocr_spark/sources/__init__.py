"""Sources and sinks.

- :mod:`.ocr_engine` — the production TokenSource (pytesseract + pdf2image
  behind an import gate; the reference's subprocess boundaries at
  app/util_ocr.py:102 and app/util_pdf_ocr.py:26-31).
- :func:`read_pages` / :func:`read_binary_files` — input scans.
- :mod:`.warc` — WARC (ISO 28500) record splitting, Common Crawl's
  container format (:func:`.warc.read_warc_records`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

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


def compact_parquet(
    spark: SparkSession,
    src: str,
    dest: str,
    target_rows_per_file: int = 1_000_000,
) -> dict:
    """Small-files compaction: rewrite a parquet directory into
    ``ceil(rows / target_rows_per_file)`` files and report the
    before/after layout. The 10^12-doc operational reality this
    serves: a resumable ingest that appends per micro-run accretes
    thousands of KB-sized files, and every downstream scan then pays
    one task + one open per file (the classic small-files problem) —
    compaction is the periodic job that restores scan efficiency.

    Semantics: content-preserving (same rows, any order), writes to a
    NEW directory and REFUSES an existing one (``errorifexists`` — a
    silent overwrite here would eat the live table on a path typo; the
    swap is the caller's transactional concern: object stores rename
    poorly, the standard pattern is write-new → repoint → delete-old,
    which Iceberg's rewrite_files does natively when a catalog exists —
    see COVERAGE.md's Iceberg probe note). Uses ``coalesce`` when
    shrinking the file count (no shuffle — partitions merge on read)
    and falls back to ``repartition`` only when the target exceeds the
    current parallelism (growing file counts needs a shuffle to split).

    Cost: ONE data scan (the row count that sizes the output) + the
    write itself. File counts on both sides come from ``inputFiles``
    (driver-side listing metadata, no job) rather than
    ``input_file_name()`` scans.

    Returns ``{"files_before", "files_after", "rows"}`` for the
    caller's lineage record."""
    df = spark.read.parquet(src)
    files_before = len(df.inputFiles())
    rows = df.count()
    n_out = max(1, -(-rows // int(target_rows_per_file)))
    out = (
        df.coalesce(n_out)
        if n_out <= df.rdd.getNumPartitions()
        else df.repartition(n_out)
    )
    out.write.mode("errorifexists").parquet(dest)
    files_after = len(spark.read.parquet(dest).inputFiles())
    return {
        "files_before": int(files_before),
        "files_after": int(files_after),
        "rows": int(rows),
    }
