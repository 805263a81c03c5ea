"""Incremental (Structured Streaming, AvailableNow) execution tests."""

from servico_ocr_spark.corpus import build_corpus
from servico_ocr_spark.schemas import PAGES_SCHEMA
from servico_ocr_spark.streaming import run_available_now


def test_available_now_incremental(spark, tmp_path):
    input_dir = str(tmp_path / "pages")
    output_dir = str(tmp_path / "analysis")
    checkpoint = str(tmp_path / "checkpoint")

    corpus = build_corpus(24)
    first = spark.createDataFrame(corpus.iloc[:12], schema=PAGES_SCHEMA)
    first.write.mode("append").parquet(input_dir)

    run_available_now(spark, input_dir, output_dir, checkpoint,
                      num_partitions=4)
    assert spark.read.parquet(output_dir).count() == 12

    # new files arrive; AvailableNow picks up ONLY the delta
    second = spark.createDataFrame(corpus.iloc[12:], schema=PAGES_SCHEMA)
    second.write.mode("append").parquet(input_dir)
    run_available_now(spark, input_dir, output_dir, checkpoint,
                      num_partitions=4)
    out = spark.read.parquet(output_dir)
    assert out.count() == 24
    assert out.select("url").distinct().count() == 24

    # nothing new → no-op batch, still 24
    run_available_now(spark, input_dir, output_dir, checkpoint,
                      num_partitions=4)
    assert spark.read.parquet(output_dir).count() == 24
