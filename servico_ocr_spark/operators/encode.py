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
