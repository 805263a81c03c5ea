"""spark-submit entrypoint for the resumable web-face extraction job.

    spark-submit --py-files servico_ocr_spark.zip \
        scripts/run_webtext.py <input_pages_path> <output_path> \
        [--min-words N] [--url-buckets B]

Reads the Common-Crawl-style pages table (url, warc_ts, html, text, lang),
anti-joins already processed urls (resume), runs the shuffle-free HTML
main-content extraction (`operators/webtext.py`), appends the analysis
table with per-row lineage (partition_id, status, dthr). Re-running after
any failure is safe: every url is written exactly once — the same
crash-recovery property as scripts/run_extraction.py, on the web face.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession

from servico_ocr_spark.operators.webtext import run_web_resumable


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("input_path")
    parser.add_argument("output_path")
    parser.add_argument("--min-words", type=int, default=0)
    parser.add_argument("--url-buckets", type=int, default=None)
    args = parser.parse_args()

    spark = SparkSession.builder.appName("servico-ocr-webtext").getOrCreate()
    pages = spark.read.parquet(args.input_path)
    run_web_resumable(spark, pages, args.output_path,
                      min_words=args.min_words, url_buckets=args.url_buckets)
    spark.stop()


if __name__ == "__main__":
    main()
