"""Benchmark harness.

Default mode (driver contract): run the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

``--scaling`` mode (BASELINE.md two-cluster-size evidence): run the
extraction pipeline on the same input at local[8] (N) and local[32] (4N),
report docs/s + pages/s at both and the scaling efficiency
``eff = throughput(4N) / (4 × throughput(N))`` (target ≥ 0.8), and verify
the outputs are byte-identical across the two parallelism levels.

Results are materialized with the noop writer so every column is computed
(a bare count() would let Catalyst prune the work we are timing).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

BENCH_QUERIES = [
    "extract_docs",
    "token_boxes",
    "word_stats",
    "dedup_exact_prefix",
    "simhash",
    "ngram_jaccard",
    "fingerprint",
    "lang_id",
    "quality_score",
    "token_counts",
    "ann_brute_topk",
    "ann_lsh_topk",
    "pricing_summary",
    "top_revenue_orders",
    "first_orders",
    "sessionize",
    "repeat_pairs",
]


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _sf_of(sf_dir: str) -> float:
    tail = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(tail.replace("sf", ""))
    except ValueError:
        return -1.0


def run_suite() -> None:
    import __spark_entry__ as entrymod
    from servico_ocr_spark.session import get_spark

    spark = get_spark(
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        app_name="servico-ocr-bench",
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    # JVM/codegen warm-up outside the timed region
    _materialize(qs["pricing_summary"](spark, SF_DIR))

    timings = {}
    total = 0.0
    for name in BENCH_QUERIES:
        start = time.perf_counter()
        _materialize(qs[name](spark, SF_DIR))
        elapsed = round(time.perf_counter() - start, 3)
        timings[name] = elapsed
        total += elapsed
    spark.stop()
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": _sf_of(SF_DIR),
            }
        )
    )


def run_scaling() -> None:
    """Two-parallelism-level throughput evidence for BENCH/BASELINE.md."""
    from pyspark.sql import functions as F

    from servico_ocr_spark.corpus import pages_from_documents
    from servico_ocr_spark.pipeline import run_extraction
    from servico_ocr_spark.session import get_spark

    results = {}
    checksums = {}
    for cores in (8, 32):
        spark = get_spark(
            master=f"local[{cores}]",
            shuffle_partitions=cores,
            app_name=f"servico-ocr-scaling-{cores}",
        )
        spark.sparkContext.setLogLevel("ERROR")
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        pages = pages_from_documents(docs).cache()
        n_docs = pages.count()  # cache input so the timed run excludes gen

        start = time.perf_counter()
        analysis = run_extraction(pages, num_partitions=cores * 2)
        stats = analysis.agg(
            F.count("*").alias("docs"),
            F.sum("paginas").alias("pages"),
            F.md5(
                F.concat_ws(
                    "|",
                    F.sort_array(
                        F.collect_list(
                            F.concat_ws(":", "url", F.md5(F.coalesce(
                                "extracted_text", F.lit(""))))
                        )
                    ),
                )
            ).alias("checksum"),
        ).collect()[0]
        elapsed = time.perf_counter() - start
        results[cores] = {
            "docs": int(stats["docs"]),
            "pages": int(stats["pages"]),
            "wall_s": round(elapsed, 2),
            "docs_per_s": round(stats["docs"] / elapsed, 2),
            "pages_per_s": round(stats["pages"] / elapsed, 2),
        }
        checksums[cores] = stats["checksum"]
        assert int(stats["docs"]) == n_docs
        spark.stop()

    eff = results[32]["docs_per_s"] / (4 * results[8]["docs_per_s"])
    out = {
        "metric": "scaling_efficiency_8_to_32_cores",
        "value": round(eff, 3),
        "unit": "ratio",
        "n": results[8],
        "four_n": results[32],
        "byte_identical_across_levels": checksums[8] == checksums[32],
        "sf": _sf_of(SF_DIR),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        run_suite()
