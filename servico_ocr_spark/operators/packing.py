"""Training-set assembly: deterministic splits and sequence packing.

The last mile of a training-data pipeline, after curation/dedup: assign
every document to a train/val/test split REPRODUCIBLY (re-running the
pipeline over a grown corpus must not move old documents between
splits), then pack documents into fixed-capacity token sequences
(concat-and-chunk, the standard pretraining batch layout).

Both operators are pure DataFrame expressions with exact DuckDB oracle
twins; neither touches Python workers.

Scale notes:

- ``assign_split`` is a pure projection (zero shuffle). The assignment
  key is the portable 48-bit hash of a salted id — hash-based, so the
  split is a property of the DOCUMENT, not of the corpus snapshot:
  adding documents never reassigns existing ones (a row_number-based
  split would).
- ``pack_sequences`` needs a running token total, which is inherently
  sequential — a single global ordering window would be a one-task
  straggler at 10^12 docs. Packing therefore runs WITHIN HASH SHARDS:
  one shuffle on ``shard`` (pick n_shards ≈ a few × executor count),
  then a per-shard cumulative sum whose cost is corpus/n_shards per
  task. Shards are independent token streams — exactly how multi-worker
  pretraining readers consume data — so sharded packing is the honest
  distributed semantics, not an approximation of a global order. The
  shard salt is the full-entropy document id hash, never a coarse
  modulus (the balls-into-bins repartition lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .common import h48, norm_text


def assign_split(
    df: DataFrame,
    splits: list[tuple[str, int]] | None = None,
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Add a ``split`` column by deterministic hash bucketing.

    ``splits`` is a list of (name, percent) pairs summing to 100; the
    bucket is ``h48(salt || ':' || id) % 100`` and consecutive bucket
    ranges are assigned in list order. Changing ``salt`` re-rolls the
    assignment; keeping it fixed makes the split stable across corpus
    growth."""
    splits = splits or [("train", 98), ("val", 1), ("test", 1)]
    if sum(p for _, p in splits) != 100:
        raise ValueError("split percents must sum to 100")
    bucket = h48(
        F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
    ) % 100
    expr = None
    lo = 0
    for name, pct in splits:
        cond = bucket < lo + pct
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += pct
    return df.withColumn("split", expr)


def pack_sequences(
    df: DataFrame,
    capacity: int,
    n_shards: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_count_col: str | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are concatenated in
    deterministic (shard, id) order and cut into ``capacity``-token
    sequences; each document reports the pack it STARTS in and its token
    offset there (a doc longer than the remaining room spans into the
    following packs, as pretraining chunking does).

    Returns ``doc_id, shard, pack_seq, pack_offset, n_tokens``. Token
    count is the normalized whitespace word count unless
    ``token_count_col`` names a precomputed column (e.g. a real BPE
    count from ``textstats.token_counts``)."""
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    if token_count_col:
        n_tokens = F.col(token_count_col).cast("long")
    else:
        n_tokens = F.size(
            F.filter(F.split(norm_text(F.col(text_col)), " "),
                     lambda x: x != "")
        ).cast("long")
    shard = h48(
        F.concat(F.lit("pack:"), F.col(id_col).cast("string"))
    ) % n_shards
    base = df.select(
        F.col(id_col).alias("doc_id"),
        shard.cast("long").alias("shard"),
        n_tokens.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # integer arithmetic throughout: `div` keeps the pack index exact
    # where double division would round past 2^53 total tokens
    return (
        base.withColumn(
            "_cum", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        )
        .select(
            "doc_id",
            "shard",
            F.expr(f"_cum div {int(capacity)}").cast("long").alias("pack_seq"),
            (F.col("_cum") % F.lit(int(capacity)))
            .cast("long")
            .alias("pack_offset"),
            "n_tokens",
        )
    )
