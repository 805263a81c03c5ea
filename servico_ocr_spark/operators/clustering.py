"""Integer-quantized Lloyd's k-means over embedding vectors — the
iterative clustering primitive behind IVF index building and corpus
bucketing, run for a FIXED number of rounds with fully deterministic,
engine-portable arithmetic so the driver oracle can replay it as
nested CTEs (the pagerank technique).

Why integers: float means diverge across engines/aggregation orders
(the repo's "never float aggregates" contract). Vectors are quantized
once via ``floor(CAST(x AS DOUBLE) * scale)`` (the exact idiom the ANN
oracles already share), all distances are integer squared-L2, and the
centroid update is an integer mean ``sum div count`` — both Spark
``div`` and DuckDB ``//`` truncate toward zero (verified on negatives),
so the rounds agree bit-for-bit.

Determinism everywhere the textbook algorithm is loose:
- init: the k vectors with the smallest ids (no RNG — seeding is the
  caller's job via id selection);
- assignment ties: the argmin is taken over the single integer
  ``d2 * k + cid`` (min distance, then smallest cluster id) — no
  engine-specific arg_min tie behavior;
- empty clusters: keep their previous centroid (left join + coalesce).

Scale shape per round: points live as an exploded (id, dim, q) table
(one row per coordinate — codegen arithmetic, no interpreted array
HOFs in the loop); centroids are k·d rows, always BROADCAST; the
distance step is one broadcast join + one (id, cid) aggregation; the
update is one (cid, dim) aggregation. Points are lazily
local-checkpointed once (referenced twice per round), centroids every
round (lineage would otherwise grow per round — the
pagerank/star-contraction discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def kmeans_lite(
    emb: DataFrame,
    k: int = 4,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """(vec_id, cluster, d2): hard assignment of every vector to the
    nearest of ``k`` centroids after ``iterations`` Lloyd rounds, with
    the integer squared-L2 distance to that centroid. See the module
    docstring for the determinism and portability contract."""
    if k < 1 or iterations < 0:
        raise ValueError("k >= 1 and iterations >= 0 required")
    pts = emb.select(
        F.col(id_col).alias("vid"),
        F.posexplode(F.col(vec_col)).alias("dim", "x"),
    ).select(
        "vid",
        "dim",
        F.floor(F.col("x").cast("double") * scale).cast("long").alias("q"),
    )
    pts = pts.localCheckpoint(eager=False)
    cent = pts.where(F.col("vid") < k).select(
        F.col("vid").alias("cid"), "dim", F.col("q").alias("cq")
    )

    def assign(c: DataFrame) -> DataFrame:
        d = (
            pts.join(F.broadcast(c), "dim")
            .groupBy("vid", "cid")
            .agg(
                F.sum(
                    (F.col("q") - F.col("cq"))
                    * (F.col("q") - F.col("cq"))
                )
                .cast("long")
                .alias("d2")
            )
        )
        return d.groupBy("vid").agg(
            F.min(F.col("d2") * k + F.col("cid")).alias("key")
        ).select(
            "vid",
            (F.col("key") % k).cast("long").alias("cid"),
            F.expr(f"key div {int(k)}").cast("long").alias("d2"),
        )

    for _ in range(iterations):
        cent = cent.localCheckpoint(eager=False)
        a = assign(cent)
        s = (
            a.select("vid", "cid")
            .join(pts, "vid")
            .groupBy("cid", "dim")
            .agg(
                F.sum("q").cast("long").alias("sm"),
                F.count("*").cast("long").alias("n"),
            )
        )
        cent = (
            cent.join(s, ["cid", "dim"], "left")
            .select(
                "cid",
                "dim",
                F.coalesce(F.expr("sm div n"), F.col("cq"))
                .cast("long")
                .alias("cq"),
            )
        )
    final = assign(cent.localCheckpoint(eager=False))
    return final.select(
        F.col("vid").alias("vec_id"),
        F.col("cid").alias("cluster"),
        "d2",
    )
