"""Semantic unit tests for operators/clustering.kmeans_lite (the
engine-parity check is the driver query `kmeans`)."""

import pytest

from servico_ocr_spark.operators import kmeans_lite, semantic_dedup


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


# ---------------------------------------------------------------------------
# semantic_dedup (SemDeDup-style: cluster -> within-cluster cosine ->
# per-pair domination on (d2, vec_id))
# ---------------------------------------------------------------------------


def test_semantic_dedup_drops_far_duplicate_keeps_central(spark):
    # two well-separated 2-D groups (k=2 init ids 0/1 sit one per
    # group); in the left group, vectors 0/2/4 are near-parallel
    # (cosine ~1) so the two farther-from-centroid members lose; 6 is
    # orthogonal-ish and survives. Right group has no high-cos pair.
    rows = [
        (0, [1.0, 0.0]), (2, [0.99, 0.01]), (4, [0.98, 0.0]),
        (6, [0.0, 0.2]),
        (1, [10.0, 10.0]), (3, [10.0, -9.9]),
    ]
    out = semantic_dedup(
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        k=2, iterations=2, threshold_e6=950_000,
    )
    got = {r["vec_id"]: (r["cluster"], r["keep"]) for r in out.collect()}
    assert len(got) == 6  # every input vector present, kept or not
    left = {i for i, (c, _) in got.items() if c == got[0][0]}
    assert {0, 2, 4, 6} <= left
    kept_left = {i for i in (0, 2, 4) if got[i][1] == 1}
    assert len(kept_left) == 1  # exactly one of the parallel trio
    assert got[6][1] == 1  # low-cosine member untouched
    assert got[1][1] == 1 and got[3][1] == 1  # cross-cluster never pairs


def test_semantic_dedup_equals_pure_python_reference(spark):
    # pseudo-random small corpus; reference recomputes the whole chain
    # independently (including the kmeans rounds) in plain Python
    import hashlib
    import math

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    dims, k, iters, t = 4, 3, 2, 700_000
    rows = [
        (i, [((h(f"{i}.{d}") % 2001) - 1000) / 1000.0 for d in range(dims)])
        for i in range(40)
    ]

    import numpy as np

    q = {
        i: [math.floor(float(np.float32(x)) * 1000) for x in v]
        for i, v in rows
    }
    cent = {c: list(q[c]) for c in range(k)}
    assign = {}
    for it in range(iters + 1):
        assign = {
            i: min(
                (sum((qi - ci) ** 2 for qi, ci in zip(q[i], cent[c])) * k + c)
                for c in cent
            )
            for i in q
        }
        assign = {i: (key % k, key // k) for i, key in assign.items()}
        if it == iters:
            break
        for c in range(k):
            members = [i for i in q if assign[i][0] == c]
            if members:
                # truncation toward zero, matching Spark div / DuckDB //
                cent[c] = [
                    int(math.trunc(sum(q[i][d] for i in members)
                                   / len(members)))
                    for d in range(dims)
                ]
    losers = set()
    ids = sorted(q)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            if assign[a][0] != assign[b][0]:
                continue
            dot = sum(p * r for p, r in zip(q[a], q[b]))
            na = sum(p * p for p in q[a])
            nb = sum(p * p for p in q[b])
            cos = math.floor(dot * 1_000_000
                             / (math.sqrt(na) * math.sqrt(nb)))
            if cos < t:
                continue
            da, db = assign[a][1], assign[b][1]
            losers.add(b if (da < db or (da == db and a < b)) else a)
    want = {
        i: (assign[i][0], assign[i][1], 0 if i in losers else 1)
        for i in q
    }

    out = semantic_dedup(
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        k=k, iterations=iters, threshold_e6=t,
    )
    got = {
        r["vec_id"]: (r["cluster"], r["d2"], r["keep"])
        for r in out.collect()
    }
    assert got == want
    # fixture must exercise both outcomes
    assert losers and len(losers) < len(q)


def test_semantic_dedup_d2_tie_larger_id_loses(spark):
    # identical vectors => same d2, cosine 1: the larger id must lose
    rows = [(0, [1.0, 1.0]), (5, [1.0, 1.0]), (7, [1.0, 1.0])]
    out = semantic_dedup(
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        k=1, iterations=1, threshold_e6=999_000,
    )
    got = {r["vec_id"]: r["keep"] for r in out.collect()}
    assert got == {0: 1, 5: 0, 7: 0}


def test_semantic_dedup_threshold_validation(spark):
    rows = [(0, [1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        semantic_dedup(df, threshold_e6=-1)


def test_pq_encode_m1_equals_kmeans_and_code_space(spark):
    """PQ degenerate case m=1 must reproduce kmeans_lite exactly
    (code == cluster, err2 == d2); at m=2 codes stay in [0, k^m) and
    err2 is the sum of the per-subspace assignments' errors."""
    from pyspark.sql import functions as F

    from servico_ocr_spark.operators import kmeans_lite, pq_encode

    rows = [
        (i, [float(((i * 7 + d * 3) % 13) - 6) / 4.0 for d in range(8)])
        for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    pq1 = {
        r["vec_id"]: (r["pq_code"], r["err2"])
        for r in pq_encode(emb, m=1, k=3, iterations=2, dim=8).collect()
    }
    km = {
        r["vec_id"]: (r["cluster"], r["d2"])
        for r in kmeans_lite(emb, k=3, iterations=2).collect()
    }
    assert pq1 == km

    pq2 = pq_encode(emb, m=2, k=3, iterations=2, dim=8)
    half = [
        kmeans_lite(
            emb.select(
                "vec_id",
                F.slice("embedding", s * 4 + 1, 4).alias("embedding"),
            ),
            k=3,
            iterations=2,
        ).collect()
        for s in range(2)
    ]
    exp = {}
    for r0 in half[0]:
        exp[r0["vec_id"]] = [r0["cluster"], r0["d2"]]
    for r1 in half[1]:
        exp[r1["vec_id"]] = (
            exp[r1["vec_id"]][0] + 3 * r1["cluster"],
            exp[r1["vec_id"]][1] + r1["d2"],
        )
    got = {
        r["vec_id"]: (r["pq_code"], r["err2"]) for r in pq2.collect()
    }
    assert got == exp
    assert all(0 <= c < 9 for c, _ in got.values())


def test_pq_search_matches_python_adc_mirror(spark):
    """ADC parity: pq_search's scores equal a pure-Python mirror that
    collects the Lloyd centroids and does table-lookup sums; the
    mirror also pins the textbook identity ADC(q, q) == err2(q)
    (self-rows are excluded from the operator output by the ANN
    convention)."""
    from pyspark.sql import functions as F

    from servico_ocr_spark.operators import pq_encode, pq_search
    from servico_ocr_spark.operators.clustering import (
        _lloyd,
        _quantized_points,
    )

    rows = [
        (i, [float(((i * 11 + d * 5) % 17) - 8) / 3.0 for d in range(8)])
        for i in range(30)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qs = emb.where("vec_id < 2")
    m, k, iters = 2, 3, 2
    dsub = 4

    cents, codes = [], {i: [] for i in range(30)}
    for s in range(m):
        sub = emb.select(
            "vec_id", F.slice("embedding", s * dsub + 1, dsub).alias("embedding")
        )
        pts = _quantized_points(sub, "vec_id", "embedding", 1000)
        cent = {
            (r["cid"], r["dim"]): r["cq"]
            for r in _lloyd(pts, k, iters).collect()
        }
        cents.append(cent)
        qpts = {
            (r["vid"], r["dim"]): r["q"] for r in pts.collect()
        }
        for i in range(30):
            best = min(
                (
                    sum(
                        (qpts[(i, d)] - cent[(c, d)]) ** 2
                        for d in range(dsub)
                    ) * k + c
                )
                for c in range(k)
            )
            codes[i].append(best % k)

    def qdist(qid, s, c):
        sub = rows[qid][1][s * dsub:(s + 1) * dsub]
        import math
        q = [math.floor(x * 1000) for x in sub]
        return sum(
            (q[d] - cents[s][(c, d)]) ** 2 for d in range(dsub)
        )

    exp = {}
    for qid in (0, 1):
        for vid in range(30):
            adc = sum(qdist(qid, s, codes[vid][s]) for s in range(m))
            if vid != qid:
                exp[(qid, vid)] = adc

    got = {
        (r["query_id"], r["vec_id"]): r["adc_d2"]
        for r in pq_search(
            emb, qs, m=m, k=k, iterations=iters, k_results=100, dim=8
        ).collect()
    }
    assert got == exp

    # textbook identity in the mirror: ADC(q, q) == err2(q)
    err = {
        r["vec_id"]: r["err2"]
        for r in pq_encode(emb, m=m, k=k, iterations=iters, dim=8).collect()
    }
    for qid in (0, 1):
        self_adc = sum(qdist(qid, s, codes[qid][s]) for s in range(m))
        assert self_adc == err[qid]


def test_ivfpq_full_probe_equals_pq_search_and_pruning_nests(spark):
    """IVF-PQ invariants: with nprobe == coarse_k (probe everything)
    the result is EXACTLY pq_search; with nprobe < coarse_k the
    result's (query, vec) pairs are a subset of the full scan's and
    every survivor keeps its adc_d2 (pruning changes reach, never
    scores)."""
    from servico_ocr_spark.operators import ivfpq_search, pq_search

    rows = [
        (i, [float(((i * 11 + d * 5) % 17) - 8) / 3.0 for d in range(8)])
        for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qs = emb.where("vec_id < 3")
    kw = dict(m=2, k=3, iterations=2, k_results=40, dim=8)

    full = {
        (r["query_id"], r["vec_id"]): r["adc_d2"]
        for r in pq_search(emb, qs, **kw).collect()
    }
    all_probe = {
        (r["query_id"], r["vec_id"]): r["adc_d2"]
        for r in ivfpq_search(
            emb, qs, coarse_k=3, nprobe=3, **kw
        ).collect()
    }
    assert all_probe == full

    pruned = {
        (r["query_id"], r["vec_id"]): r["adc_d2"]
        for r in ivfpq_search(
            emb, qs, coarse_k=3, nprobe=1, **kw
        ).collect()
    }
    assert 0 < len(pruned) < len(full)
    for pair, d in pruned.items():
        assert full[pair] == d


def test_pq_recall_measured_band_and_monotone_in_code_bits(spark):
    """Honest-recall pin (the SRP-recall discipline): PQ recall@10 vs
    exact integer L2 on the real sf0.001 embeddings. These synthetic
    near-random vectors are PQ's structural WORST case (no low-dim
    manifold), so the band is wide — but the driver config (m=4,k=16,
    2^16 codes) must land in it, and must beat the rejected 2×4 demo
    config (16 codes, measured 0.075): more code bits, more recall."""
    import numpy as np

    from servico_ocr_spark.operators import pq_search

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = emb.collect()
    V = {
        r["vec_id"]: np.floor(
            np.array(r["embedding"], dtype=np.float64) * 1000
        ).astype(np.int64)
        for r in rows
    }
    ids = sorted(V)
    X = np.stack([V[i] for i in ids])
    qids = [i for i in ids if i < 8]
    exact = {}
    for q in qids:
        d2 = ((X - V[q]) ** 2).sum(1)
        d2[ids.index(q)] = 1 << 60
        order = np.lexsort((np.array(ids), d2))
        exact[q] = set(np.array(ids)[order[:10]])

    def mean_recall(m, k):
        res = {}
        out = pq_search(
            emb, emb.where("vec_id < 8"), m=m, k=k, iterations=2,
            k_results=10, dim=64,
        ).collect()
        for r in out:
            res.setdefault(r["query_id"], set()).add(r["vec_id"])
        return sum(len(res[q] & exact[q]) for q in qids) / (10 * len(qids))

    r_big = mean_recall(4, 16)    # the driver config
    r_tiny = mean_recall(2, 4)    # the rejected demo config
    assert 0.15 <= r_big <= 0.60, r_big
    assert r_big > r_tiny, (r_big, r_tiny)
