"""Spark-path tests: differential vs the oracle, partitioning independence,
resume/idempotence, error side-output, skew balancing.
"""

import pytest

from servico_ocr_spark.corpus import build_corpus
from servico_ocr_spark.pipeline import (
    analyze_page_row,
    boxes_table,
    docs_table,
    lineage_table,
    run_extraction,
    run_resumable,
    weighted_repartition,
    with_page_estimate,
)
from servico_ocr_spark.schemas import PAGES_SCHEMA

N_DOCS = 48


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(build_corpus(N_DOCS), schema=PAGES_SCHEMA)


@pytest.fixture(scope="module")
def analysis(spark, pages):
    return run_extraction(pages, num_partitions=4).cache()


def test_differential_byte_identity(spark, pages, analysis):
    got = {r["url"]: r for r in analysis.collect()}
    corpus = build_corpus(N_DOCS)
    assert len(got) == N_DOCS
    for _, row in corpus.iterrows():
        try:
            oracle = analyze_page_row(row["url"], row["html"])
        except Exception:
            assert got[row["url"]]["status"] == "erro"
            continue
        res = got[row["url"]]
        assert res["extracted_text"] == oracle["extracted_text"]
        assert res["clean_text"] == oracle["clean_text"]
        assert res["md"] == oracle["md"]
        assert res["html_render"] == oracle["html_render"]
        assert len(res["boxes"]) == len(oracle["boxes"])
        for got_box, oracle_box in zip(res["boxes"], oracle["boxes"]):
            assert got_box["texto"] == oracle_box["texto"]
            assert got_box["tipo"] == oracle_box["tipo"]
            assert list(got_box["box_xyla"]) == oracle_box["box_xyla"]


def test_partitioning_independence(spark, pages):
    cols = ["url", "extracted_text", "md", "html_render"]
    one = (
        run_extraction(pages, num_partitions=1)
        .select(*cols).toPandas().sort_values("url").reset_index(drop=True)
    )
    eight = (
        run_extraction(pages, num_partitions=8)
        .select(*cols).toPandas().sort_values("url").reset_index(drop=True)
    )
    assert one.equals(eight)


def test_error_side_output(spark, analysis):
    lineage = lineage_table(analysis)
    errors = lineage.where("status = 'erro'").collect()
    assert errors, "corpus contains corrupt + Faixa docs"
    for row in errors:
        assert row["error"].startswith("Erro: ")
    ok = docs_table(analysis)
    assert ok.count() + len(errors) == N_DOCS


def test_boxes_table_shape(spark, analysis):
    boxes = boxes_table(analysis)
    row = boxes.first()
    assert {"url", "pagina", "box", "id", "texto", "tipo"} <= set(boxes.columns)
    assert row["tipo"] in {"P", "C", "R", "T", "F", "E", "CT"}


def test_resume_idempotence(spark, pages, tmp_path):
    out = str(tmp_path / "analysis")
    run_resumable(spark, pages.limit(20), out)
    assert spark.read.parquet(out).count() == 20
    run_resumable(spark, pages, out)
    df = spark.read.parquet(out)
    assert df.count() == N_DOCS
    assert df.select("url").distinct().count() == N_DOCS
    run_resumable(spark, pages, out)
    assert spark.read.parquet(out).count() == N_DOCS


def test_weighted_repartition_spreads_heavy(spark, pages):
    est = with_page_estimate(pages.select("url", "html"))
    balanced = weighted_repartition(est, num_partitions=4)
    # heavy docs (est_pages >= 8) must not collapse into one partition when
    # there are several, and the job must preserve every row
    assert balanced.count() == N_DOCS
    pid = balanced.withColumn(
        "pid", __import__("pyspark").sql.functions.spark_partition_id()
    )
    heavy = pid.where("est_pages >= 8").select("pid").distinct().count()
    n_heavy = pid.where("est_pages >= 8").count()
    assert heavy >= min(n_heavy, 2) or n_heavy <= 1
