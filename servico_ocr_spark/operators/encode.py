"""Distributed dictionary encoding: dense unique integer ids for string
values — the building block that turns url/host/term strings into the
compact long keys iterative algorithms want (e.g. connected components'
integer node ids) WITHOUT either of the two broken shortcuts:

- a 48/64-bit digest as the id silently merges distinct values at
  corpus scale (birthday collisions — the same failure mode CLAUDE.md
  records for digest-partitioned windows), and
- ``row_number() OVER (ORDER BY value)`` is a single global sort task —
  a one-task straggler over 10^9 distinct values.

The encoding here is the standard two-stage distributed zipWithIndex,
made engine-portable by using the md5-derived 48-bit hash for the
bucket assignment (never for identity): values are hashed into ``B``
buckets, ranked within their bucket by value order, and offset by the
cumulative counts of the preceding buckets. Ids are dense ``[0, n)``,
unique, and deterministic (a pure function of the distinct-value SET —
independent of partitioning and insert order), but NOT globally
value-sorted; only the intra-bucket order is.

Scale shape: one distinct aggregation (map-side combinable), one
window per (bucket) — straggler bounded at ~n/B rows — and a B-row
cumulative-offset window that is a single tiny task by construction
(B is a constant; its "window" sorts B rows, not data). The offsets
join broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .common import h48


def dictionary_encode(
    df: DataFrame, value_col: str = "value", buckets: int = 256
) -> DataFrame:
    """(value, id): dense unique long ids over the DISTINCT values of
    ``value_col`` (see module docstring for guarantees and shape)."""
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    vals = (
        df.select(F.col(value_col).alias("value"))
        .where(F.col("value").isNotNull())
        .distinct()
        .withColumn("_b", F.pmod(h48(F.col("value")), F.lit(buckets)))
    )
    rn = F.row_number().over(Window.partitionBy("_b").orderBy("value"))
    ranked = vals.withColumn("_rn", rn)
    counts = vals.groupBy("_b").agg(F.count("*").alias("_c"))
    w_off = (
        Window.orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "_b",
        F.coalesce(F.sum("_c").over(w_off), F.lit(0)).alias("_off"),
    )
    return ranked.join(F.broadcast(offsets), "_b").select(
        "value",
        (F.col("_off") + F.col("_rn") - 1).cast("long").alias("id"),
    )


#: Seed prefix for the per-(key, shard) rendezvous score. The oracle SQL
#: in ``__spark_entry__`` interpolates the SAME constant so both engines
#: hash identical strings (the pii-pattern sharing rule).
RENDEZVOUS_SEED = "rv:"

#: Keeps ``score * n_shards + shard`` inside BIGINT: score < 2^48, so the
#: combined key stays below 2^48 · 2^14 = 2^62.
MAX_RENDEZVOUS_SHARDS = 16384


def rendezvous_shard(col: Column, n_shards: int) -> Column:
    """Highest-random-weight (rendezvous) shard id for a string key
    (Thaler & Ravishankar 1996): ``argmax over s of h48(seed‖key‖'#'‖s)``.

    The property that makes HRW the placement function of choice for a
    10^12-document corpus: when a shard is ADDED, a key moves only if
    the new shard wins its argmax — so exactly the keys that land on
    the new shard move (an expected 1/(n+1) of them) and every other
    assignment is untouched. Hash-mod (``assign_split``-style) remaps
    ~all keys on any resize; HRW is the minimal-churn alternative, at
    the inherent cost of O(n_shards) hash evaluations per key.

    Shape: a pure per-row projection — ``n_shards`` codegen'd md5
    expressions folded by ``greatest`` (NO explode, NO shuffle, NO
    interpreted HOF — the CLAUDE.md array-HOF lesson). argmax is the
    kmeans trick in max form: ``greatest(score_s·n + s) % n`` — a
    score tie (2^-48) breaks to the HIGHEST shard id, deterministically
    and identically in DuckDB's ``greatest``. The O(n_shards)-per-row
    cost means this shape is for shard counts in the tens-to-hundreds;
    beyond that, production systems jump-hash or nest two HRW levels
    (32×32 covers 1024 shards at 64 hashes/row).
    """
    if not (1 <= n_shards <= MAX_RENDEZVOUS_SHARDS):
        raise ValueError(f"n_shards must be in [1, {MAX_RENDEZVOUS_SHARDS}]")
    combined = [
        h48(F.concat(F.lit(RENDEZVOUS_SEED), col, F.lit(f"#{s}")))
        * n_shards
        + s
        for s in range(n_shards)
    ]
    best = combined[0] if n_shards == 1 else F.greatest(*combined)
    return (best % n_shards).cast("long")


def shard_churn(
    df: DataFrame,
    key_col: str = "key",
    old_shards: int = 8,
    new_shards: int = 9,
) -> DataFrame:
    """``(shard_old, shard_new, n_keys)``: the full resize-transition
    matrix between two HRW shard counts — the reshard-cost audit a
    placement change ships with. HRW's minimal-disruption guarantee
    makes the matrix near-diagonal: growing ``n → n+1`` yields at most
    ``2n+1`` live cells (the diagonal plus the ``(s, n)`` column), and
    every off-diagonal key lands on an ADDED shard
    (property-tested in ``tests/test_operators.py``).

    Shape: one column-pruned scan, one per-row projection (two greatest
    chains), ONE map-side-combinable count agg — at most
    ``old·new`` groups of state. Zero joins, zero explodes.
    """
    k = F.col(key_col)
    return (
        df.select(
            rendezvous_shard(k, old_shards).alias("shard_old"),
            rendezvous_shard(k, new_shards).alias("shard_new"),
        )
        .groupBy("shard_old", "shard_new")
        .agg(F.count("*").cast("long").alias("n_keys"))
    )


def quantize_embeddings(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1000,
    levels: int = 255,
) -> DataFrame:
    """``(vec_id, n_dims, code_sum, code_checksum, err_abs_sum)``:
    per-dimension scalar quantization of an embedding column to
    ``levels+1``-level integer codes (int8 for the default 255) — the
    standard 4× ANN memory compression (FAISS ``SQ8``-style: per-dim
    min/max calibration, affine code). All integer, engine-portable:
    coordinates first quantize on the corpus-wide ``floor(x·scale)``
    grid the ANN/kmeans operators share, then

        code = ((q − min_d) · levels) div span_d,  span_d = max(max_d − min_d, 1)
        deq  = min_d + (code · span_d) div levels

    so ``code ∈ [0, levels]`` exactly and the reconstruction error
    ``|q − deq|`` is ≤ ``span_d div levels + 1`` per coordinate.
    ``code_checksum = Σ code·(dim+1)`` is an order-free integrity
    checksum of the code vector (a graded stand-in for the packed int8
    payload column a production sink would write); ``err_abs_sum`` is
    the per-vector total reconstruction error — the telemetry that
    decides whether SQ8 is safe for a given encoder. Division is safe:
    both operands are non-negative by construction, so the Spark
    ``div`` / DuckDB ``//`` truncate-toward-zero subtlety never binds.

    BIGINT audit: ``(q−min)·levels ≤ 2·scale·levels ≈ 5·10^5`` at the
    default grid; ``code_checksum ≤ levels·d²`` — safe past 10^6 dims.

    Scale shape: posexplode → ONE map-side-combinable per-dim min/max
    agg (state = d rows) broadcast back onto a second pruned scan →
    ONE per-vector agg. The explode subtree is deliberately evaluated
    twice rather than localCheckpointed: materializing n·d exploded
    rows costs more than re-reading one column-pruned parquet column
    (the calibration side collapses to d rows map-side)."""
    pts = emb.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(F.col(vec_col)).alias("dim", "x"),
    ).select(
        "vec_id",
        F.col("dim").cast("long").alias("dim"),
        F.floor(F.col("x").cast("double") * scale).cast("long").alias("q"),
    )
    stats = pts.groupBy("dim").agg(
        F.min("q").alias("mn"),
        F.greatest(F.max("q") - F.min("q"), F.lit(1)).alias("span"),
    )
    coded = pts.join(F.broadcast(stats), "dim").select(
        "vec_id",
        "dim",
        "q",
        "mn",
        "span",
        F.expr(f"((q - mn) * {int(levels)}) div span").alias("code"),
    )
    agg = coded.groupBy("vec_id").agg(
        F.count("*").cast("long").alias("n_dims"),
        F.sum("code").cast("long").alias("code_sum"),
        F.sum(F.col("code") * (F.col("dim") + 1)).cast("long")
        .alias("code_checksum"),
        F.sum(
            F.abs(
                F.col("q")
                - (F.col("mn") + F.expr(f"(code * span) div {int(levels)}"))
            )
        ).cast("long").alias("err_abs_sum"),
    )
    return (
        emb.select(F.col(id_col).alias("vec_id"))
        .join(agg, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("n_dims", F.lit(0)).cast("long").alias("n_dims"),
            F.coalesce("code_sum", F.lit(0)).cast("long").alias("code_sum"),
            F.coalesce("code_checksum", F.lit(0)).cast("long")
            .alias("code_checksum"),
            F.coalesce("err_abs_sum", F.lit(0)).cast("long")
            .alias("err_abs_sum"),
        )
    )
