"""BM25 top-k retrieval (operators/search) and BFS crawl depths
(operators/links.bfs_depths): integer-contract differentials against
independent pure-Python references, plus the retrieval/frontier edge
cases the operators promise."""

import hashlib

from servico_ocr_spark.operators import bfs_depths, bm25_topk
from servico_ocr_spark.operators.common import words_array  # noqa: F401


def _h(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------

VOCAB = ["dup", "scan", "query", "sort", "merge", "join", "hash", "row"]


def _corpus(n=80):
    """Pseudo-random corpus over a small vocabulary: doc i holds
    (h(i) % 9) + (1 if i % 7 else 12) tokens drawn by md5 arithmetic —
    varied lengths (the 1-in-7 long docs exercise length norm) and
    varied tf."""
    rows = []
    for i in range(n):
        n_tok = (_h(f"len{i}") % 9) + (12 if i % 7 == 0 else 1)
        toks = [
            VOCAB[_h(f"{i}.{j}") % len(VOCAB)] for j in range(n_tok)
        ]
        rows.append((i, " ".join(toks)))
    rows.append((n, ""))  # zero-token doc: counts in n_docs only
    return rows


def _bm25_reference(rows, terms, k, k1_pct=120, b_pct=75,
                    idf_scale=100, tf_scale=1000):
    """Independent pure-Python BM25 with the exact integer contract.
    Tokenization here is plain whitespace split — the corpus is already
    normalized lowercase ASCII, so it coincides with words_array by
    construction, not by sharing code."""
    docs = {i: [w for w in t.split(" ") if w] for i, t in rows}
    n_docs = len(docs)
    total = sum(len(ws) for ws in docs.values())
    avgdl = max(1, total // n_docs)
    dfreq = {
        t: sum(1 for ws in docs.values() if t in ws) for t in terms
    }
    scored = []
    for i, ws in docs.items():
        dl = len(ws)
        score, n_terms = 0, 0
        for t in sorted(set(terms)):
            tf = ws.count(t)
            if tf == 0:
                continue
            n_terms += 1
            idf = ((n_docs - dfreq[t] + 1) * idf_scale) // (dfreq[t] + 1)
            rel = (dl * 100) // avgdl
            inner = (100 - b_pct) + (b_pct * rel) // 100
            tfc = (tf * (k1_pct + 100) * 100 * tf_scale) // (
                tf * 10000 + k1_pct * inner
            )
            score += idf * tfc
        if n_terms:
            scored.append((i, n_terms, dl, score))
    scored.sort(key=lambda r: (-r[3], r[0]))
    return scored[:k]


def test_bm25_equals_pure_python_reference(spark):
    rows = _corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    terms = ["dup", "row", "query"]
    for k in (15, 500):  # boundary top-k AND the full ranking
        got = [
            (r["doc_id"], r["n_terms"], r["dl"], r["score"])
            for r in bm25_topk(df, terms, k=k).collect()
        ]
        assert got == _bm25_reference(rows, terms, k)
    # the corpus must exercise partial AND full term matches
    assert {g[1] for g in got} >= {1, 2, 3}


def test_bm25_rare_term_outranks_common(spark):
    # 'needle' appears once in one short doc; 'hay' is in every doc.
    rows = [(i, "hay " * 5) for i in range(30)] + [(99, "needle hay")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    top = bm25_topk(df, ["needle", "hay"], k=3).collect()
    assert top[0]["doc_id"] == 99 and top[0]["n_terms"] == 2


def test_bm25_zero_match_docs_absent_and_k_bounds(spark):
    rows = [(1, "alpha beta"), (2, "gamma"), (3, "alpha alpha")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_topk(df, ["alpha"], k=10).collect()
    assert [r["doc_id"] for r in out] == [3, 1]  # 2 never scored
    assert bm25_topk(df, ["alpha"], k=1).count() == 1


def test_bm25_length_norm_prefers_shorter_at_equal_tf(spark):
    rows = [(1, "t " + "pad " * 40), (2, "t pad")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_topk(df, ["t"], k=2).collect()
    assert [r["doc_id"] for r in out] == [2, 1]
    assert out[0]["score"] > out[1]["score"]


def test_bm25_deterministic_tie_break_on_doc_id(spark):
    rows = [(i, "same text") for i in (7, 3, 5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_topk(df, ["same"], k=2).collect()
    assert [r["doc_id"] for r in out] == [3, 5]


def test_bm25_plan_take_ordered_and_broadcasts(spark):
    """Top-k must be TakeOrderedAndProject (per-partition k-row heaps,
    no global sort), and both the ≤|terms|-row df table and the 1-row
    corpus-scalar table must reach the big side as broadcasts — the
    per-doc scoring path must never shuffle on anything but
    (doc_id, word) and doc_id."""
    rows = [(i, "alpha beta gamma") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    plan = (
        bm25_topk(df, ["alpha", "beta"], k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert plan.count("BroadcastHashJoin") >= 1
    assert "BroadcastNestedLoopJoin" in plan  # 1-row scalars cross join
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# BFS crawl depths
# ---------------------------------------------------------------------------


def _graph(n_nodes=40, n_edges=55):
    # 55 edges on 40 nodes: depth spread to 8 hops, 6 nodes reachable
    # within 2, and 16 nodes unreachable from the seeds — exercises
    # the budget cap AND the absent-unreachables contract
    return [
        (f"n{_h(f'{i}s') % n_nodes}", f"n{_h(f'{i}d') % n_nodes}")
        for i in range(n_edges)
    ]


def _bfs_reference(edges, seeds, max_hops):
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for h in range(1, max_hops + 1):
        nxt = {
            d
            for u in frontier
            for d in adj.get(u, ())
            if d not in dist
        }
        if not nxt:
            break
        for d in nxt:
            dist[d] = h
        frontier = nxt
    return dist


def test_bfs_equals_pure_python_reference(spark):
    edges = _graph()
    seeds = ["n0", "n17", "offgraph"]
    df = spark.createDataFrame(edges, "src string, dst string")
    sdf = spark.createDataFrame([(s,) for s in seeds], "node string")
    for hops in (0, 2, 8):
        got = {
            r["node"]: r["depth"]
            for r in bfs_depths(df, sdf, max_hops=hops).collect()
        }
        assert got == _bfs_reference(edges, seeds, hops)
    # the fixture must exercise the cap (hops=2 strictly smaller set)
    assert len(_bfs_reference(edges, seeds, 2)) < len(
        _bfs_reference(edges, seeds, 8)
    )
    # ... and unreachable nodes must exist at the full budget
    all_nodes = {n for e in edges for n in e}
    assert all_nodes - set(_bfs_reference(edges, seeds, 8))


def test_bfs_early_exit_beats_budget_and_offgraph_seed_kept(spark):
    # path a->b->c: diameter 2, budget 99 must stop after 3 rounds
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    sdf = spark.createDataFrame([("a",), ("zzz",)], "node string")
    got = {
        r["node"]: r["depth"]
        for r in bfs_depths(df, sdf, max_hops=99).collect()
    }
    assert got == {"a": 0, "zzz": 0, "b": 1, "c": 2}


def test_bfs_duplicate_seeds_and_cycle(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string"
    )
    sdf = spark.createDataFrame([("a",), ("a",)], "node string")
    got = {
        r["node"]: r["depth"]
        for r in bfs_depths(df, sdf, max_hops=4).collect()
    }
    assert got == {"a": 0, "b": 1}


# ---------------------------------------------------------------------------
# query-by-example BM25 + reciprocal-rank fusion
# ---------------------------------------------------------------------------

def _mlt_reference(rows, query_ids, k, max_term_df=None):
    """Pure-Python bm25_by_example: scalars over docs with >= 1 token,
    terms = the query doc's distinct words under the df cap, self
    excluded."""
    docs = {i: [w for w in t.split(" ") if w] for i, t in rows}
    nonempty = {i: ws for i, ws in docs.items() if ws}
    n_docs = len(nonempty)
    avgdl = max(1, sum(len(ws) for ws in nonempty.values()) // n_docs)
    vocab = {w for ws in nonempty.values() for w in ws}
    dfreq = {t: sum(1 for ws in nonempty.values() if t in ws)
             for t in vocab}
    out = {}
    for q in query_ids:
        terms = {t for t in set(docs.get(q, []))
                 if max_term_df is None or dfreq[t] <= max_term_df}
        scored = []
        for i, ws in nonempty.items():
            if i == q:
                continue
            dl, score, n_terms = len(ws), 0, 0
            for t in terms:
                tf = ws.count(t)
                if tf == 0:
                    continue
                n_terms += 1
                idf = ((n_docs - dfreq[t] + 1) * 100) // (dfreq[t] + 1)
                inner = 25 + (75 * ((dl * 100) // avgdl)) // 100
                tfc = (tf * 220 * 100 * 1000) // (tf * 10000 + 120 * inner)
                score += idf * tfc
            if n_terms:
                scored.append((i, n_terms, score))
        scored.sort(key=lambda r: (-r[2], r[0]))
        for rank, (i, n_terms, score) in enumerate(scored[:k], 1):
            out[(q, i)] = (n_terms, score, rank)
    return out


def test_bm25_by_example_matches_python_reference(spark):
    from servico_ocr_spark.operators import bm25_by_example

    rows = _corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    qids = spark.createDataFrame([(0,), (7,), (13,)], "doc_id long")
    for cap in (None, 40):
        got = {(r["query_id"], r["doc_id"]):
               (r["n_terms"], r["score"], r["rank"])
               for r in bm25_by_example(
                   df, qids, k=6, max_term_df=cap).collect()}
        assert got == _mlt_reference(rows, [0, 7, 13], 6, max_term_df=cap)
        assert got  # non-vacuous at both cap settings
    # self-exclusion: a query never retrieves itself
    assert not any(q == d for q, d in got)


def test_rrf_fuse_arithmetic_and_sentinels(spark):
    from servico_ocr_spark.operators import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, doc_id long, rank long")
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)],
        "query_id long, doc_id long, rank long")
    got = {r["doc_id"]: (r["rank_a"], r["rank_b"], r["rrf_x1e6"], r["rank"])
           for r in rrf_fuse(a, b, k=3).collect()}
    # doc 11 is in both lists: 1e6//62 + 1e6//61 = 16129 + 16393
    assert got[11] == (2, 1, 16129 + 16393, 1)
    # singles carry the -1 sentinel and one contribution
    assert got[10] == (1, -1, 1000000 // 61, 2)
    assert got[13] == (-1, 2, 1000000 // 62, 3)
    # k=3 cap drops doc 12 (1e6//63 = 15873, rank 4)
    assert 12 not in got


def test_hard_negatives_excludes_neardups_keeps_lookalikes(spark):
    """The mining contract: a retrieved candidate that IS a near-dup of
    the query (capped-word Jaccard ≥ threshold) is excluded; a
    lexically overlapping but sub-threshold candidate survives as a
    negative, re-ranked contiguously; zero-overlap candidates survive
    with jaccard 0 (left-join rule)."""
    from servico_ocr_spark.operators import bm25_hard_negatives

    rows = [
        (1, "alpha beta gamma delta rare"),            # query
        (2, "alpha beta gamma delta rare"),            # exact dup → excluded
        (3, "alpha beta twenty nine ten eleven rare"),  # overlap 3/9=33 → kept
        (4, "rare twelve thirteen fourteen fifteen sixteen"),  # low overlap → kept
        (5, "unrelated words only here nothing shared"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    q = docs.where("doc_id = 1").select("doc_id")
    out = bm25_hard_negatives(
        docs, q, k=10, cand_k=10, sim_threshold_pct=50
    ).collect()
    got = {r["doc_id"]: r for r in out}
    assert 2 not in got          # the near-dup is not a negative
    assert 3 in got and 4 in got
    assert got[3]["jaccard_pct"] == 33  # 3 shared / 9 union
    ranks = sorted(r["neg_rank"] for r in out)
    assert ranks == list(range(1, len(out) + 1))
