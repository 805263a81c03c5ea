"""Semantic unit tests for operators/clustering.kmeans_lite (the
engine-parity check is the driver query `kmeans`)."""

import pytest

from servico_ocr_spark.operators import kmeans_lite


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def test_kmeans_separates_obvious_clusters(spark):
    # two tight 2-D groups; ids 0 and 1 (the k=2 init) sit one per group
    left = [(0, [0.0, 0.0]), (2, [0.1, 0.0]), (4, [0.0, 0.1])]
    right = [(1, [1.0, 1.0]), (3, [0.9, 1.0]), (5, [1.0, 0.9])]
    out = kmeans_lite(_emb(spark, left + right), k=2, iterations=2)
    got = {r["vec_id"]: r["cluster"] for r in out.collect()}
    assert {got[0], got[2], got[4]} == {0}
    assert {got[1], got[3], got[5]} == {1}


def test_kmeans_zero_iterations_assigns_to_init(spark):
    # no Lloyd rounds: assignment against the raw init centroids
    out = kmeans_lite(
        _emb(spark, [(0, [0.0]), (1, [1.0]), (2, [0.4]), (3, [0.6])]),
        k=2,
        iterations=0,
    )
    got = {r["vec_id"]: (r["cluster"], r["d2"]) for r in out.collect()}
    # q scale 1000: 0.4 -> 400 (d2 to c0 = 160000), 0.6 -> 600
    assert got[2] == (0, 160000) and got[3] == (1, 160000)
    assert got[0] == (0, 0) and got[1] == (1, 0)


def test_kmeans_tie_break_and_empty_cluster_survive(spark):
    # identical init vectors: every point ties between c0 and c1, the
    # d2*k+cid argmin sends them all to the SMALLER cid, and cluster 1
    # is genuinely EMPTY after round 1. The coalesce rule must keep its
    # centroid AT 500 — and that kept centroid then RE-CAPTURES the
    # two 0.5 points in round 2 (c0's mean moved to 533), proving the
    # kept centroid stays a live participant, not a tombstone. Without
    # coalesce the round-2 join would silently run against k-1
    # centroids and p0/p1 would stay in cluster 0.
    rows = [(0, [0.5]), (1, [0.5]), (2, [0.6])]
    out = kmeans_lite(_emb(spark, rows), k=2, iterations=2)
    got = {r["vec_id"]: r["cluster"] for r in out.collect()}
    assert got == {0: 1, 1: 1, 2: 0}


def test_kmeans_validates_params(spark):
    with pytest.raises(ValueError):
        kmeans_lite(_emb(spark, [(0, [0.0])]), k=0)
    with pytest.raises(ValueError):
        kmeans_lite(_emb(spark, [(0, [0.0])]), iterations=-1)
