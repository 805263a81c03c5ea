"""Bigram LM + CCNet-style quality bucketing (operators/lm.py)."""

from collections import Counter

import pytest

DOC_SCHEMA = "doc_id long, text string"


def _py_bigrams(text):
    # mirror of common.words_array's whitespace tokenization on inputs
    # that need no accent/symbol normalization
    ws = [w for w in text.split(" ") if w]
    return list(zip(ws, ws[1:]))


def _py_model(docs):
    c = Counter()
    for _, t in docs:
        c.update(_py_bigrams(t))
    ctx = Counter()
    for (w1, _), n in c.items():
        ctx[w1] += n
    return {
        (w1, w2): (n, ctx[w1], n * 1_000_000 // ctx[w1])
        for (w1, w2), n in c.items()
    }


def _py_scores(docs):
    model = _py_model(docs)
    out = {}
    for did, t in docs:
        bis = _py_bigrams(t)
        if not bis:
            out[did] = (0, 0)
            continue
        s = sum(model[b][2] for b in bis)
        out[did] = (len(bis), s // len(bis))
    return out


def _py_buckets(scores):
    vals = sorted((s for _, s in scores.values()), reverse=True)
    n = len(vals)
    out = {}
    for did, (nb, s) in scores.items():
        gt = sum(1 for v in vals if v > s)
        if gt * 3 < n:
            b = "head"
        elif gt * 3 < 2 * n:
            b = "middle"
        else:
            b = "tail"
        out[did] = (nb, s, b)
    return out


DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the cat ran"),
    (3, "the dog sat on the mat"),
    (4, "mat the cat the"),
    (5, "one"),          # single token: zero bigrams
    (6, ""),             # empty: zero bigrams
    (7, "the cat sat on the mat the cat sat"),
]


def test_bigram_lm_matches_python_reference(spark):
    from servico_ocr_spark.operators import bigram_lm

    df = spark.createDataFrame(DOCS, DOC_SCHEMA)
    got = {(r["w1"], r["w2"]): (r["n_bigram"], r["n_ctx"], r["p_x1e6"])
           for r in bigram_lm(df).collect()}
    assert got == _py_model(DOCS)
    # conditional probabilities per context sum to <= 1e6 (truncation
    # loses at most one part per successor)
    per_ctx = Counter()
    for (w1, _), (_, _, p) in got.items():
        per_ctx[w1] += p
    assert all(v <= 1_000_000 for v in per_ctx.values())


def test_lm_doc_scores_known_values_and_zero_restore(spark):
    from servico_ocr_spark.operators import lm_doc_scores

    df = spark.createDataFrame(DOCS, DOC_SCHEMA)
    got = {r["doc_id"]: (r["n_bigrams"], r["lm_score_x1e6"])
           for r in lm_doc_scores(df).collect()}
    assert got == _py_scores(DOCS)
    # the zero-bigram docs ARE present with score 0
    assert got[5] == (0, 0)
    assert got[6] == (0, 0)


def test_lm_quality_buckets_thirds_and_ties(spark):
    from servico_ocr_spark.operators import lm_doc_scores, lm_quality_buckets

    df = spark.createDataFrame(DOCS, DOC_SCHEMA)
    got = {r["doc_id"]: (r["n_bigrams"], r["lm_score_x1e6"], r["bucket"])
           for r in lm_quality_buckets(lm_doc_scores(df)).collect()}
    assert got == _py_buckets(_py_scores(DOCS))
    # every doc got a bucket, zero-bigram docs share one (same score 0)
    assert len(got) == len(DOCS)
    assert got[5][2] == got[6][2]


def test_lm_quality_buckets_tie_block_lands_whole(spark):
    from servico_ocr_spark.operators import lm_quality_buckets

    # 6 docs: scores 100,100,100,100,50,10 — the 4-way tie straddles the
    # head/middle boundary (n=6, head needs gt*3<6 i.e. gt<2) and must
    # land WHOLE in head (gt=0 for all four)
    rows = [(i, 1, s) for i, s in enumerate([100, 100, 100, 100, 50, 10])]
    df = spark.createDataFrame(
        rows, "doc_id long, n_bigrams long, lm_score_x1e6 long"
    )
    got = {r["doc_id"]: r["bucket"] for r in lm_quality_buckets(df).collect()}
    assert got == {0: "head", 1: "head", 2: "head", 3: "head",
                   4: "tail", 5: "tail"}
    # score 50: gt=4, 4*3=12 >= 12=2n -> tail; score 10: gt=5 -> tail


def test_lm_partitioning_independence(spark):
    from servico_ocr_spark.operators import lm_doc_scores, lm_quality_buckets

    docs = [
        (i, " ".join(
            ("the", "cat", "sat", "mat", "dog", "ran")[(i * j + j) % 6]
            for j in range((i % 7) + 1)
        ))
        for i in range(60)
    ]
    base = None
    for parts in (1, 7):
        df = spark.createDataFrame(docs, DOC_SCHEMA).repartition(parts)
        got = sorted(
            (r["doc_id"], r["n_bigrams"], r["lm_score_x1e6"], r["bucket"])
            for r in lm_quality_buckets(lm_doc_scores(df)).collect()
        )
        if base is None:
            base = got
        else:
            assert got == base
    # and the python twin agrees end-to-end
    want = _py_buckets(_py_scores(docs))
    assert {d: (nb, s, b) for d, nb, s, b in base} == want


# ---------------------------------------------------------------------------
# skip-gram pair generation
# ---------------------------------------------------------------------------

def _py_skipgrams(docs, window=3, t_ppm=10_000, salt="sg"):
    """Independent pure-Python mirror of operators/lm.skipgram_pairs
    (tokenize -> deterministic subsample -> compact -> window pairs)."""
    import hashlib

    def h48(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)

    toks = []
    for did, t in docs:
        ws = [w for w in t.split(" ") if w]
        toks += [(did, i, w) for i, w in enumerate(ws)]
    f = Counter(w for _, _, w in toks)
    tot = max(1, sum(f.values()))
    fppm = {w: n * 1_000_000 // tot for w, n in f.items()}
    kept = {}
    for did, pos, w in toks:
        r = h48(f"{salt}:{did}:{pos}:{w}") % 1_000_000
        if r * r * fppm[w] <= t_ppm * 10**12:
            kept.setdefault(did, []).append(w)
    pairs = Counter()
    for ws in kept.values():
        for i, a in enumerate(ws):
            for j in range(i + 1, min(i + 1 + window, len(ws))):
                pairs[(a, ws[j])] += 1
                pairs[(ws[j], a)] += 1
    return dict(pairs)


def test_skipgram_pairs_matches_python_reference(spark):
    from servico_ocr_spark.operators import skipgram_pairs

    docs = [
        (i, " ".join(
            ("the", "cat", "sat", "mat", "dog", "ran", "far", "red")
            [(i * j + j) % 8]
            for j in range((i % 9) + 1)
        ))
        for i in range(80)
    ] + [(100, ""), (101, "one")]
    df = spark.createDataFrame(docs, DOC_SCHEMA)
    got = {(r["center"], r["context"]): r["n_pairs"]
           for r in skipgram_pairs(df).collect()}
    assert got == _py_skipgrams(docs)


def test_skipgram_subsampling_binds_and_is_frequency_monotone(spark):
    from servico_ocr_spark.operators import skipgram_pairs

    # 'hot' dominates the corpus; 'rare' words are infrequent. With the
    # default threshold both branches must be live, and the python twin
    # (same arithmetic) is the witness that the keep RATE tracks
    # sqrt(t/f): hot's survival fraction < rare's.
    docs = [(i, " ".join(["hot"] * 18 + [f"rare{i % 5}"] * 2))
            for i in range(40)]
    want = _py_skipgrams(docs)
    df = spark.createDataFrame(docs, DOC_SCHEMA)
    got = {(r["center"], r["context"]): r["n_pairs"]
           for r in skipgram_pairs(df).collect()}
    assert got == want
    # subsampling bound: some hot-hot adjacency survived, but far fewer
    # pairs than the no-subsampling run produces
    full = {(r["center"], r["context"]): r["n_pairs"]
            for r in skipgram_pairs(df, subsample_ppm=1_000_000).collect()}
    assert got[("hot", "hot")] > 0
    assert got[("hot", "hot")] < full[("hot", "hot")]
    assert full == _py_skipgrams(docs, t_ppm=1_000_000)


def test_skipgram_compaction_bridges_dropped_tokens(spark):
    from servico_ocr_spark.operators import skipgram_pairs

    # Force a frequency profile where the middle word is dropped from
    # every position (f_ppm so high that r^2*f_ppm > thr for ALL its
    # occurrences would be probabilistic; instead compare against the
    # python twin and assert at least one (a, b) pair whose ORIGINAL
    # distance exceeds the window exists — proof the window runs over
    # the COMPACTED sequence, word2vec's semantics).
    docs = [(i, "alpha " + " ".join(["hot"] * 6) + " beta")
            for i in range(30)]
    df = spark.createDataFrame(docs, DOC_SCHEMA)
    got = {(r["center"], r["context"]): r["n_pairs"]
           for r in skipgram_pairs(df, window=2).collect()}
    assert got == _py_skipgrams(docs, window=2)
    # alpha..beta are 7 apart raw (> window 2); any surviving pair
    # between them can only come from post-drop compaction
    assert got.get(("alpha", "beta"), 0) > 0
    # and symmetry holds everywhere
    assert all(got[(b, a)] == n for (a, b), n in got.items())
