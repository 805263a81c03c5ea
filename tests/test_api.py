"""Service-compat facade tests (reference entry point B, SURVEY.md §3.2)."""

from servico_ocr_spark import api
from servico_ocr_spark.corpus import build_corpus
from servico_ocr_spark.pipeline import JOB_TS, lineage_table
from servico_ocr_spark.schemas import PAGES_SCHEMA


def test_submit_is_cached(spark, tmp_path):
    out = str(tmp_path / "analysis")
    pages = spark.createDataFrame(build_corpus(12), schema=PAGES_SCHEMA)
    assert api.submit_documents(spark, pages, out) == 12
    # resubmitting the same corpus is a full cache hit
    assert api.submit_documents(spark, pages, out) == 0


def test_document_id_is_md5():
    assert api.document_id(b"abc", ".pdf") == (
        "900150983cd24fb0d6963f7d28e17f72.pdf"
    )


def test_rendered_view_filters(spark, tmp_path):
    out = str(tmp_path / "analysis")
    pages = spark.createDataFrame(build_corpus(16), schema=PAGES_SCHEMA)
    api.submit_documents(spark, pages, out)
    analysis = spark.read.parquet(out)
    url = analysis.where("status = 'ok'").select("url").first()["url"]
    html = api.rendered_view(analysis, url, fmt="html")
    md = api.rendered_view(analysis, url, fmt="md")
    assert html and "Página: 1" in html
    assert md and md.startswith("<sub><mark>Página: 1</mark></sub>")
    assert api.rendered_view(analysis, "https://nope/x") is None


def test_tokens_and_tasks(spark, tmp_path):
    out = str(tmp_path / "analysis")
    pages = spark.createDataFrame(build_corpus(8), schema=PAGES_SCHEMA)
    api.submit_documents(spark, pages, out)
    lineage = lineage_table(spark.read.parquet(out))
    urls = [r["url"] for r in lineage.select("url").limit(2).collect()]
    tokens = api.register_tokens(
        spark, [("tokA", urls[0]), ("tokA", urls[1]), ("tokB", urls[0])]
    )
    tasks = api.list_tasks(tokens, lineage, "tokA").collect()
    assert len(tasks) == 2
    assert {t["url"] for t in tasks} == set(urls)


def test_parallel_map_preserves_order(spark):
    result = api.parallel_map(spark, lambda x: x * 2, list(range(50)),
                              num_partitions=4)
    assert result == [x * 2 for x in range(50)]


def test_health(spark, tmp_path):
    out = str(tmp_path / "analysis")
    pages = spark.createDataFrame(build_corpus(4), schema=PAGES_SCHEMA)
    api.submit_documents(spark, pages, out)
    lineage = lineage_table(spark.read.parquet(out))
    assert api.health(lineage, JOB_TS)
    assert not api.health(lineage, "2026-01-01 01:00:00")


def test_compact_parquet_reduces_files_preserves_content(spark, tmp_path):
    """Small-files compaction: 16 tiny append files → few files sized
    by target_rows_per_file; rows byte-identical (any order); report
    ties out."""
    from servico_ocr_spark.sources import compact_parquet

    src = str(tmp_path / "small")
    dest = str(tmp_path / "compact")
    for i in range(16):
        spark.createDataFrame(
            [(i * 10 + j, f"doc-{i}-{j}") for j in range(10)],
            "doc_id long, text string",
        ).coalesce(1).write.mode("append").parquet(src)
    rep = compact_parquet(spark, src, dest, target_rows_per_file=80)
    assert rep["rows"] == 160
    assert rep["files_before"] == 16
    assert rep["files_after"] == 2
    a = sorted(
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(src).collect()
    )
    b = sorted(
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(dest).collect()
    )
    assert a == b
    # dest must be NEW: a second compaction to the same path refuses
    # instead of silently clobbering the just-written table
    import pytest as _pytest

    with _pytest.raises(Exception, match="already exists"):
        compact_parquet(spark, src, dest, target_rows_per_file=80)
