"""The extraction pipeline: pages → (docs, boxes, lineage).

Spark-first design notes (this is where the 100 TB story lives):

* **Zero-shuffle core.** One input row = one document, and every analysis
  stage (assembly → enrichment → classification → ordering → render) is
  per-document, so the whole pipeline is a single ``mapInPandas`` over the
  scan — no groupBy, no join, no shuffle in the hot path. The reference's
  process-pool fan-out (app/util_fila.py) becomes plain Spark task
  parallelism.
* **Skew.** Catalyst can't see document weight inside the UDF, so weight is
  handled in data space: a cheap page-count estimate is parsed from the
  payload header JVM-side, and :func:`weighted_repartition` spreads heavy
  documents round-robin across partitions (the north_star's "salted
  repartition by estimated page count"). The ranking window is partitioned
  by a url-hash group so no single-task global sort exists at scale.
* **Resume / idempotence.** The reference's folder-queue lifecycle
  (entrada → processando → saida|erro, app/util_processar_pasta.py:48-63)
  becomes: anti-join the input against already-written lineage urls, then
  append. Re-running after a crash never duplicates and never recomputes
  finished documents (J4 — the cache-hit anti-join of
  app/app_controller.py:77-79 is the same pattern).
* **Error isolation.** A corrupt document (junk bytes, Faixa-geometry crash)
  produces a lineage row with status='erro' and the reference error message
  pattern (app/util_processar_pasta.py:412-421) instead of failing the job.
"""

from __future__ import annotations

from functools import partial
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .core.analyze import (
    analyze_document,
    assemble_text,
    document_stats,
)
from .core.render import filter_regions, render_html, render_markdown
from .core.tokenizer import document_tokens
from .corpus import parse_payload
from .schemas import ANALYSIS_SCHEMA, DOCS_COLUMNS, LINEAGE_COLUMNS

JOB_TS = "2026-01-01 00:00:00"  # deterministic dthr (reference X8 format)
HEAVY_PAGE_THRESHOLD = 8


def analyze_page_row(url: str, html: bytes, renders: bool = True):
    """Pure per-document analysis used by both the Spark stage and the
    pytest oracle. Returns a dict matching ANALYSIS_SCHEMA (minus
    partition_id / est_pages).

    ``renders=False`` skips the md/html render strings (columns stay in
    the schema as NULL). The renders roughly double per-document output
    bytes (each embeds the full text again), and on a bandwidth-bound
    box that Arrow mass is what caps high-core-count throughput — a
    training-data pipeline that only needs text/spans/stats should not
    pay for presentation artifacts it never writes. Analysis semantics
    (boxes, text, spans, stats) are byte-identical either way
    (test_renders_flag_only_affects_render_columns)."""
    payload = parse_payload(html)
    tokens = document_tokens(url, payload.get("text") or "", payload["archetype"])
    boxes, n_pages, conf_sum, conf_count = analyze_document(tokens)
    extracted_text, spans = assemble_text(boxes)
    clean_boxes = filter_regions(
        boxes, keep_header=False, keep_stamps=False, keep_quotes=True
    )
    clean_text = "\n\n".join(b["texto"] for b in clean_boxes)
    n_chars, n_words = document_stats(boxes)
    return {
        "url": url,
        "status": "ok",
        "error": None,
        "paginas": n_pages,
        "n_boxes": len(boxes),
        "mean_conf": (conf_sum / conf_count) if conf_count else None,
        "qtd_letras": n_chars,
        "qtd_palavras": n_words,
        "pagina_tipo": boxes[0]["pagina_tipo"] if boxes else None,
        "extracted_text": extracted_text,
        "clean_text": clean_text,
        "md": render_markdown(boxes) if renders else None,
        "html_render": render_html(boxes) if renders else None,
        "spans": spans,
        "boxes": boxes,
    }


def _error_row(url: str, exc: Exception) -> dict:
    # reference error status: f'Erro: {msg[:30]}...'
    # (app/util_processar_pasta.py:418)
    msg = str(exc)
    return {
        "url": url,
        "status": "erro",
        "error": f"Erro: {msg[:30]}..." if len(msg) > 30 else f"Erro: {msg}",
        "paginas": None,
        "n_boxes": None,
        "mean_conf": None,
        "qtd_letras": None,
        "qtd_palavras": None,
        "pagina_tipo": None,
        "extracted_text": None,
        "clean_text": None,
        "md": None,
        "html_render": None,
        "spans": None,
        "boxes": None,
    }


def _process_batches(
    batches: Iterable[pd.DataFrame], renders: bool = True
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel. Row = document; Arrow batches in, one result row
    per document out. The loop is per-*document* (the correct vectorization
    grain — all token/box work inside is per-doc pure Python over tiny
    in-memory lists, exactly like one reference worker task)."""
    from pyspark import TaskContext

    ctx = TaskContext.get()
    pid = ctx.partitionId() if ctx is not None else -1
    for batch in batches:
        out = []
        urls = batch["url"].tolist()
        htmls = batch["html"].tolist()
        ests = batch["est_pages"].tolist() if "est_pages" in batch else [None] * len(urls)
        for url, html, est in zip(urls, htmls, ests):
            try:
                row = analyze_page_row(url, html, renders=renders)
            except Exception as exc:  # error side-output, never fail the job
                row = _error_row(url, exc)
            row["partition_id"] = pid
            row["dthr"] = JOB_TS
            row["est_pages"] = est
            out.append(row)
        if out:
            yield pd.DataFrame(out)


def with_page_estimate(pages: DataFrame) -> DataFrame:
    """JVM-side page-count estimate from the payload prefix (n_pages field);
    corrupt/undecodable payloads fall back to 1. Analogous to the
    reference's DPI/page knowledge before rasterizing (app/util_pdf_ocr.py:26-31).
    """
    # substring the BINARY first — cast(html as string) would materialize
    # the whole payload per row just to read a 120-byte header
    prefix = F.substring(F.col("html"), 1, 120).cast("string")
    est = F.regexp_extract(prefix, r'"n_pages":(\d+)', 1)
    # regexp_extract yields '' on no match; try_cast keeps ANSI mode happy
    return pages.withColumn(
        "est_pages",
        F.coalesce(est.try_cast("long"), F.lit(1)).alias("est_pages"),
    )


_PARTITION_SALTS: dict[int, list[int]] = {}


def _partition_salts(spark: SparkSession, num_partitions: int) -> list[int]:
    """For each target partition t, a long ``s_t`` with
    ``pmod(murmur3(s_t), P) == t`` — so ``repartition(P, col)`` on a
    column holding ``s_t`` routes the row to exactly partition t.
    DataFrame repartition only ever hash-partitions; this inverts the
    hash once per P (one tiny job over 64·P candidate longs, memoized)
    to get deterministic explicit placement without dropping to RDDs."""
    if num_partitions not in _PARTITION_SALTS:
        cand = spark.range(0, num_partitions * 64).select(
            "id", F.pmod(F.hash("id"), F.lit(num_partitions)).alias("t")
        )
        salts: dict[int, int] = {}
        for row in cand.collect():
            salts.setdefault(row["t"], row["id"])
        assert len(salts) == num_partitions
        _PARTITION_SALTS[num_partitions] = [
            salts[t] for t in range(num_partitions)
        ]
    return _PARTITION_SALTS[num_partitions]


def weighted_repartition(
    df: DataFrame,
    weight_col: str = "est_pages",
    num_partitions: int | None = None,
    rank_groups: int = 64,
) -> DataFrame:
    """Skew-aware repartition: heavy rows are dealt round-robin within
    their url-hash group; light rows spread by full-entropy url hash (at
    10^12-doc scale they are uniform by the law of large numbers).

    Heavy rows are rank-ordered by weight inside ``rank_groups`` url-hash
    groups (a distributed window — never a global sort), and row with
    rank r of group g goes to partition ``pmod(hash(g) + r − 1, P)`` via
    the murmur-salt table: each group's weight-sorted rank run deals
    round-robin from a group-specific start, so a burst of 500-page PDFs
    spreads across all partitions (measured max/mean partition weight
    ~1.1 in the dense regime, vs ~1.8 for hashing the coarse (rank,
    group) key — balls-into-bins). When heavy docs number only ~P the
    per-group starts are independent and the residual imbalance is
    binomial — the coordination-free floor; an exact cross-group
    enumeration needs a second full input scan (est_pages derives from
    the payload header, so nothing prunable) and was rejected as worse
    at scale. NOTE: first use per ``num_partitions`` runs a tiny
    memoized salt-table job at plan-construction time.
    """
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    salts = _partition_salts(df.sparkSession, num_partitions)
    salt_arr = F.array(*[F.lit(s) for s in salts])

    heavy = F.col(weight_col) >= F.lit(HEAVY_PAGE_THRESHOLD)
    group = F.pmod(F.xxhash64("url"), F.lit(rank_groups))
    win = Window.partitionBy(group).orderBy(F.desc(weight_col), "url")
    # heavy rows sort before light within each group (weight desc), so
    # row_number restricted to heavy rows IS their in-group weight rank
    rank = F.row_number().over(win)
    # target partition: consecutive ranks of a group deal round-robin
    # from a group-specific random start — a group's weight-sorted run
    # spreads perfectly; cross-group starts are independent rotations.
    # (A dense cross-group enumeration would need either a second pass
    # over the input or a global sort — both worse at scale than the
    # residual binomial imbalance this leaves when heavy docs are fewer
    # than ~10× partitions.)
    # long arithmetic: hash() and row_number() are 32-bit, and ANSI mode
    # turns the int overflow (hash near Int.MaxValue + tens of millions
    # of heavy rows in one group) into a job-killing exception
    target = F.pmod(
        F.hash(group.cast("long")).cast("long") + rank.cast("long") - 1,
        F.lit(num_partitions),
    )
    # element_at(salt_arr, t+1) routes EXACTLY to partition t: salts[t]
    # murmur-hashes onto t under repartition's HashPartitioning. Hashing
    # the (rank, group) pair directly is balls-into-bins over a small key
    # set — some partitions get 3 heavy docs, some 0, and the stragglers
    # own the wall clock.
    salted = df.withColumn(
        "_pk",
        F.when(
            heavy, F.element_at(salt_arr, (target + 1).cast("int"))
        ).otherwise(F.xxhash64("url")),
    )
    return salted.repartition(num_partitions, "_pk").drop("_pk")


def run_extraction(
    pages: DataFrame,
    num_partitions: int | None = None,
    balance: bool = True,
    renders: bool = True,
) -> DataFrame:
    """pages → analysis DataFrame (one row per document, ANALYSIS_SCHEMA).

    Lazy apart from the one-time salt-table probe in
    :func:`weighted_repartition` (tiny, memoized per partition count);
    callers split the result into docs/boxes/lineage with the selectors
    below or write it once with :func:`write_analysis`.

    ``renders=False`` leaves the md/html_render columns NULL (same
    schema): skips the per-doc render compute AND roughly halves the
    Arrow/output bytes per document — the lever for text-only consumers
    (see :func:`analyze_page_row`).
    """
    staged = with_page_estimate(pages.select("url", "html"))
    if balance:
        staged = weighted_repartition(staged, num_partitions=num_partitions)
    kernel = partial(_process_batches, renders=renders)
    return staged.mapInPandas(kernel, schema=ANALYSIS_SCHEMA)


def docs_table(analysis: DataFrame) -> DataFrame:
    return analysis.where(F.col("status") == "ok").select(*DOCS_COLUMNS)


def boxes_table(analysis: DataFrame) -> DataFrame:
    """Exploded per-box table keyed (url, pagina, id)."""
    return (
        analysis.where(F.col("status") == "ok")
        .select("url", F.explode("boxes").alias("b"))
        .select("url", "b.*")
    )


def lineage_table(analysis: DataFrame) -> DataFrame:
    return analysis.select(*LINEAGE_COLUMNS)


def write_analysis(analysis: DataFrame, path: str,
                   url_buckets: int | None = None) -> None:
    """Idempotent append of the combined analysis table (Iceberg-style:
    partitioned parquet append; swap for ``writeTo(...).append()`` when an
    Iceberg catalog is configured).

    ``url_buckets`` adds a bucket(url) partition column — the 10^12-doc
    layout: resume anti-joins and point lookups prune to one bucket
    directory instead of scanning the table."""
    writer = analysis.write.mode("append")
    if url_buckets:
        analysis = analysis.withColumn(
            "url_bucket", F.pmod(F.xxhash64("url"), F.lit(url_buckets))
        )
        writer = analysis.write.mode("append").partitionBy("url_bucket")
    writer.parquet(path)


def resume_filter(
    spark: SparkSession, pages: DataFrame, output_path: str
) -> DataFrame:
    """Checkpoint/resume: drop pages whose url already has an output row
    (left anti join — the J4 cache-hit pattern). Missing output dir means a
    fresh run."""
    try:
        done = spark.read.parquet(output_path).select("url")
    except Exception:
        return pages
    return pages.join(done, "url", "left_anti")


def run_resumable(
    spark: SparkSession,
    pages: DataFrame,
    output_path: str,
    num_partitions: int | None = None,
) -> None:
    """Checkpointed, resumable batch run: anti-join processed → analyze →
    append. Safe to re-run after a crash; every url is written exactly once.
    """
    todo = resume_filter(spark, pages, output_path)
    write_analysis(run_extraction(todo, num_partitions=num_partitions), output_path)
