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


def semantic_dedup(
    emb: DataFrame,
    k: int = 4,
    iterations: int = 3,
    threshold_e6: int = 400_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """(vec_id, cluster, d2, keep): SemDeDup-style semantic dedup
    (Abbas et al., 2023 — public method) composed from this module's
    k-means and the ANN face's integer cosine: cluster the embeddings,
    generate candidate pairs ONLY within a cluster, and for every pair
    with cosine ≥ ``threshold_e6``/1e6 drop the endpoint farther from
    its centroid (larger d2, ties to the larger id) — keeping, per
    near-duplicate neighborhood, the member most central to its
    semantic cluster.

    ``keep`` semantics (deterministic, non-iterative): a vector is
    removed iff SOME above-threshold same-cluster neighbor beats it on
    (d2, vec_id). This is pairwise domination, not connected
    components — each pair independently kills its worse endpoint, so
    the decision is one self-join + one distinct, no fixpoint loop
    (the components variant already exists as `neardup_components`;
    SemDeDup's published form is per-pair too).

    Scale shape: the only quadratic step is the within-cluster
    self-join, and ``k`` is its knob — SemDeDup at corpus scale picks
    k ~ n/target_cluster_size so the per-cluster pair count stays
    bounded; the join shuffles once on the cluster id (both sides), the
    dot product is the ANN face's zip_with+aggregate (measured faster
    than an unrolled element_at chain at 64 dims — see the repo's HOF
    counter-example), and the loser set collapses through a
    map-side-combinable distinct before the final restoring left join.
    The cosine is the SAME floored-double expression the ANN operators
    use (dot·1e6 / (√qnorm·√vnorm), floor) — both engines floor the
    same IEEE value, proven by the ANN oracles.
    """
    from .similarity import _dot, _int_vec

    if threshold_e6 < 0:
        raise ValueError("threshold_e6 >= 0 required")
    assign = kmeans_lite(
        emb, k=k, iterations=iterations,
        id_col=id_col, vec_col=vec_col, scale=scale,
    ).localCheckpoint(eager=False)  # referenced 3x below
    vecs = emb.select(
        F.col(id_col).alias("vec_id"),
        _int_vec(F.col(vec_col)).alias("v"),
    ).select(
        "vec_id", "v", _dot(F.col("v"), F.col("v")).alias("nrm")
    )
    m = assign.join(vecs, "vec_id")
    a = m.select(
        F.col("vec_id").alias("ia"), F.col("cluster").alias("ca"),
        F.col("d2").alias("da"), F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = m.select(
        F.col("vec_id").alias("ib"), F.col("cluster").alias("cb"),
        F.col("d2").alias("db"), F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    pairs = (
        a.join(b, (F.col("ca") == F.col("cb")) & (F.col("ia") < F.col("ib")))
        .select(
            "ia", "da", "ib", "db",
            F.floor(
                _dot(F.col("va"), F.col("vb")) * 1_000_000
                / (F.sqrt(F.col("na").cast("double"))
                   * F.sqrt(F.col("nb").cast("double")))
            ).cast("long").alias("cos_sim_e6"),
        )
        .where(F.col("cos_sim_e6") >= threshold_e6)
    )
    # ia < ib, so on a d2 tie the pair's loser is ib
    losers = pairs.select(
        F.when(
            (F.col("da") < F.col("db"))
            | ((F.col("da") == F.col("db")) & (F.col("ia") < F.col("ib"))),
            F.col("ib"),
        ).otherwise(F.col("ia")).alias("vec_id")
    ).distinct()
    return (
        assign.join(
            losers.select("vec_id", F.lit(0).alias("_lost")),
            "vec_id", "left",
        )
        .select(
            "vec_id", "cluster", "d2",
            F.when(F.col("_lost").isNull(), F.lit(1))
            .otherwise(F.lit(0)).cast("int").alias("keep"),
        )
    )


def pq_encode(
    emb: DataFrame,
    m: int = 2,
    k: int = 4,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    dim: int | None = None,
) -> DataFrame:
    """``(vec_id, pq_code, err2)``: product quantization (Jégou et al.
    2011, the FAISS IVF-PQ memory layout): the vector splits into ``m``
    contiguous subvectors, each quantized by its OWN ``k``-centroid
    integer k-means (:func:`kmeans_lite` — same seeds-by-id, same
    deterministic argmin), and the code packs the per-subspace
    centroid ids radix-``k`` (``code = Σ c_s·k^s``). ``err2`` is the
    summed squared quantization error — exactly the ADC residual a PQ
    index trades for ``m·log2(k)`` bits per vector instead of
    ``4·dim`` bytes (here: 4 bits vs 256 bytes, a 512× compression).

    Scale shape: ``m`` independent kmeans runs over column-pruned
    subvector slices (each is the kmeans_lite shape: broadcast
    centroids, combinable aggs, O(iterations) rounds), joined on the
    id — subspaces are embarrassingly parallel by construction, which
    is WHY PQ trains at 10^12 vectors when a full-dimension k·m^...
    codebook cannot. ``dim`` avoids an eager length probe when known;
    ``dim % m == 0`` required (PQ's equal-split contract)."""
    if dim is None:
        dim = int(
            emb.select(F.size(F.col(vec_col)).alias("d")).limit(1)
            .collect()[0]["d"]
        )
    if m < 1 or dim % m != 0:
        raise ValueError(f"m must divide dim (dim={dim}, m={m})")
    if k ** m > 2 ** 62:
        raise ValueError("code space exceeds BIGINT")
    dsub = dim // m
    parts: DataFrame | None = None
    for s in range(m):
        sub = emb.select(
            F.col(id_col),
            F.slice(F.col(vec_col), s * dsub + 1, dsub).alias(vec_col),
        )
        a = kmeans_lite(
            sub, k=k, iterations=iterations, id_col=id_col,
            vec_col=vec_col, scale=scale,
        ).select(
            "vec_id",
            F.col("cluster").alias(f"_c{s}"),
            F.col("d2").alias(f"_e{s}"),
        )
        parts = a if parts is None else parts.join(a, "vec_id")
    code = F.lit(0).cast("long")
    err = F.lit(0).cast("long")
    for s in range(m):
        code = code + F.col(f"_c{s}") * (k ** s)
        err = err + F.col(f"_e{s}")
    return parts.select(
        "vec_id",
        code.cast("long").alias("pq_code"),
        err.cast("long").alias("err2"),
    )
