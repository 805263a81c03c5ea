"""Decompose the bm25_by_example chain constant (VERDICT r4 item 4).

Three driver queries (bm25_related / rrf_fusion / hard_negatives) each
pay the ~15 s bm25_by_example chain at sf0.1. This script times each
stage in isolation at the same sf, mirroring the operator's own
dataflow (operators/search.py:156) with explicit materialization
barriers, plus the full driver query for reference. Results go to
BENCH/PLANS.md.

Usage: python scripts/profile_bm25.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window, functions as F  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "4")


def t(label, fn, best_of=3, warm=True):
    if warm:
        fn()
    best = float("inf")
    for _ in range(best_of):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:40s} {best:7.3f} s", flush=True)
    return best


def main():
    from servico_ocr_spark.operators.common import words_array
    from servico_ocr_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(
        master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    # full driver queries, steady state, for reference
    qs = entrymod.queries()
    for name in ("bm25_related", "rrf_fusion", "hard_negatives"):
        t(f"FULL {name}", lambda n=name: qs[n](spark, SF_DIR).count())

    # --- stage decomposition of bm25_by_example(docs, mlt, k=10, cap) ---
    t("docs.count() (the cap probe)", lambda: docs.count())

    def mlt():
        return (
            docs.where(
                F.array_contains(words_array(F.col("text")), F.lit("dup"))
            )
            .select("doc_id")
            .orderBy("doc_id")
            .limit(8)
        )

    t("query-doc selection (_mlt_queries)", lambda: mlt().count())

    def tok():
        return docs.select(
            F.col("doc_id"),
            F.size(words_array(F.col("text"))).cast("long").alias("dl"),
            F.explode(words_array(F.col("text"))).alias("word"),
        )

    t("tokenize+explode only", lambda: tok().count())

    def postings():
        return tok().groupBy("doc_id", "word").agg(
            F.count("*").cast("long").alias("tf"),
            F.max("dl").alias("dl"),
        )

    t("postings build (tok+groupBy)", lambda: postings().count())

    # materialize postings once, then time the downstream alone
    post = postings().localCheckpoint(eager=True)
    cap = docs.count() // 2

    def downstream():
        scalars = (
            post.groupBy("doc_id").agg(F.max("dl").alias("dl"))
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("dl").cast("long").alias("total_tokens"))
            .select("n_docs", F.greatest(
                F.lit(1).cast("long"),
                F.expr("total_tokens div n_docs").cast("long")).alias("avgdl"))
        )
        dfreq = post.groupBy("word").agg(
            F.count("*").cast("long").alias("df_t")
        ).where(F.col("df_t") <= cap)
        qids = mlt().select(F.col("doc_id").alias("query_id")).distinct()
        qt = (
            post.join(F.broadcast(qids),
                      post["doc_id"] == qids["query_id"])
            .join(dfreq, "word").select("query_id", "word", "df_t")
        )
        matched = post.join(F.broadcast(qt), "word").where(
            F.col("doc_id") != F.col("query_id"))
        per_term = matched.crossJoin(F.broadcast(scalars)).select(
            "query_id", "doc_id",
            F.expr("((n_docs - df_t + 1) * 100) div (df_t + 1)").alias("idf"),
            F.expr("(tf * 220 * 100 * 1000) div (tf * 10000 + 120 * "
                   "((100 - 75) + (75 * ((dl * 100) div avgdl)) div 100))"
                   ).alias("tfc"))
        w = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.asc("doc_id"))
        return (per_term.groupBy("query_id", "doc_id")
                .agg(F.count("*").cast("long").alias("n_terms"),
                     F.sum(F.col("idf") * F.col("tfc")).cast("long")
                     .alias("score"))
                .withColumn("rank", F.row_number().over(w).cast("long"))
                .where(F.col("rank") <= 10))

    t("downstream of materialized postings", lambda: downstream().count())
    spark.stop()


if __name__ == "__main__":
    main()
