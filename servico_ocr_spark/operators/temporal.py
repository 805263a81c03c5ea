"""Backward as-of join: for each probe row, the single build row with
the greatest timestamp at-or-before (or strictly before) the probe's,
within the same key — the "latest state as of t" lookup that powers
point-in-time feature joins, click→purchase attribution, and slowly-
changing-dimension reads. Spark has no native ASOF JOIN (DuckDB does —
the driver oracle uses it verbatim), and the naive rewrite

    probe JOIN build ON key AND build.ts <= probe.ts  → max per probe

materializes O(|probe| × per-key build history) rows before reducing —
quadratic per key, dead at crawl scale. This operator uses the
union-and-window shape instead:

- tag build rows 0 (or 2 for the strict variant) and probe rows 1,
- union them, window PARTITION BY key ORDER BY (ts, tag) with a
  running ``last(value_struct, ignorenulls=True)`` over
  UNBOUNDED PRECEDING..CURRENT ROW,
- keep probe rows: the running last non-null struct IS the as-of match.

Cost is ONE shuffle of |probe| + |build| rows and a per-key sort —
no join operator at all, no row amplification, and partial-frame
``last`` evaluates incrementally (O(1) per row). Skew bound: a hot key
concentrates its rows in one window partition, the same bound every
per-key ordered operator here accepts (cf. _cap_doc_freq's documented
trade in operators/dedup.py). The inclusive tie (build.ts == probe.ts
matches) is expressed purely by the tag sort order.

Reference scope note: the reference service has no temporal join
(SURVEY §2.3 lists only equi/anti shapes); this is engine surface the
training-data pipeline needs (event attribution, snapshot-as-of reads).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F

_RESERVED = ("_k", "_ts", "_tag", "_asof", "_tb")


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    probe_ts: str,
    build_ts: str,
    value_cols: Sequence[str],
    inclusive: bool = True,
    tie_break: Optional[str] = None,
    prefix: str = "asof_",
) -> DataFrame:
    """All ``probe`` columns plus ``{prefix}{c}`` for each build value
    column — null when the key has no build row at-or-before (strictly
    before, if ``inclusive=False``) the probe timestamp.

    ``tie_break``: build column used to pick ONE row when several build
    rows share (key, ts) — the row with the max tie_break wins (max_by,
    mirroring DuckDB ``arg_max``). Without it, equal-(key, ts) build
    rows make the match nondeterministic; pass it whenever the build
    side is not already unique per (key, ts). Null probe timestamps or
    keys never match (they sort before every build row / partition
    alone). Build rows with a null key or ts are dropped — they can
    never be "the latest at-or-before" anything.
    """
    for c in _RESERVED:
        if c in probe.columns or c in build.columns:
            raise ValueError(f"column name {c!r} is reserved by asof_join")
    if not value_cols:
        raise ValueError("value_cols must name at least one build column")

    vstruct = F.struct(*[F.col(c) for c in value_cols]).alias("_asof")
    b = build.where(
        F.col(on).isNotNull() & F.col(build_ts).isNotNull()
    )
    if tie_break is not None:
        b = (
            b.select(
                F.col(on).alias("_k"),
                F.col(build_ts).alias("_ts"),
                vstruct,
                F.col(tie_break).alias("_tb"),
            )
            .groupBy("_k", "_ts")
            .agg(F.max_by("_asof", F.col("_tb")).alias("_asof"))
        )
    else:
        b = b.select(
            F.col(on).alias("_k"), F.col(build_ts).alias("_ts"), vstruct
        )
    # inclusive: build sorts BEFORE the probe at equal ts (tag 0 < 1) so
    # an equal-ts build row is visible to the running last; strict:
    # after (tag 2 > 1), so it is not.
    b = b.withColumn("_tag", F.lit(0 if inclusive else 2))

    p = (
        probe.withColumn("_k", F.col(on))
        .withColumn("_ts", F.col(probe_ts))
        .withColumn("_tag", F.lit(1))
    )
    u = p.unionByName(b, allowMissingColumns=True)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn(
        "_asof", F.last("_asof", ignorenulls=True).over(w)
    ).where(F.col("_tag") == 1)
    return matched.select(
        *probe.columns,
        *[
            F.col(f"_asof.{c}").alias(f"{prefix}{c}")
            for c in value_cols
        ],
    )


def asof_join_broadcast(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    probe_ts: str,
    build_ts: str,
    value_cols: Sequence[str],
    inclusive: bool = True,
    prefix: str = "asof_",
) -> DataFrame:
    """Broadcast variant of :func:`asof_join` for the small-dimension
    case (SCD lookups, config/state tables): when the build side fits
    in a broadcast, shuffling the 100-TB probe through the union window
    is pure waste. Here the build side collapses to ONE ROW PER KEY
    holding its time-sorted history as an array of structs, broadcasts,
    and each probe row binary-searches nothing — it filters the (small)
    array to entries at-or-before its timestamp and takes the last.

    Plan: one build-side aggregation, one BroadcastHashJoin, zero probe
    shuffles. The array filter is an interpreted HOF per probe row —
    fine when per-key history is small (the premise of broadcasting);
    for large build sides use :func:`asof_join`, whose cost is one
    shuffle regardless of history shape. Ties among build rows sharing
    (key, ts) resolve to the last struct in sort order — pass a
    pre-deduped build (or distinct value_cols) for determinism, same
    contract as asof_join's tie_break.
    """
    for c in _RESERVED:
        if c in probe.columns or c in build.columns:
            raise ValueError(
                f"column name {c!r} is reserved by asof_join_broadcast"
            )
    if not value_cols:
        raise ValueError("value_cols must name at least one build column")
    hist = (
        build.where(F.col(on).isNotNull() & F.col(build_ts).isNotNull())
        .select(
            F.col(on).alias("_k"),
            F.struct(
                F.col(build_ts).alias("_ts"),
                *[F.col(c) for c in value_cols],
            ).alias("_e"),
        )
        .groupBy("_k")
        # sort_array orders struct entries by the leading _ts field
        .agg(F.sort_array(F.collect_list("_e")).alias("_asof"))
    )
    joined = probe.join(
        F.broadcast(hist),
        probe[on] == hist["_k"],
        "left",
    )
    pts = F.col(probe_ts)
    eligible = (
        F.filter(F.col("_asof"), lambda e: e["_ts"] <= pts)
        if inclusive
        else F.filter(F.col("_asof"), lambda e: e["_ts"] < pts)
    )
    match = F.when(
        F.col("_asof").isNull() | (F.size(eligible) == 0) | pts.isNull(),
        F.lit(None),
    ).otherwise(F.element_at(eligible, F.size(eligible)))
    out = joined.withColumn("_m", match)
    return out.select(
        *probe.columns,
        *[
            F.col(f"_m.{c}").alias(f"{prefix}{c}")
            for c in value_cols
        ],
    )
