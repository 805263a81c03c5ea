"""Property-based fuzzing of the per-document kernel (hypothesis).

The greedy column rewrite and the renumber/classify passes are the
sequential hard parts (SURVEY.md §7.3); these properties must hold for ANY
token stream, not just the fixture archetypes:

- analysis never crashes on arbitrary layouts (except the replicated Faixa
  geometry error);
- no box is lost or duplicated by sorting/column-rewrite;
- ids are contiguous globally, box ordinals contiguous per page;
- spans reconstruct extracted_text exactly;
- the whole kernel is a pure function (same input → same output).
"""

from hypothesis import given, settings, strategies as st

from servico_ocr_spark.core.analyze import (
    assemble_boxes,
    assemble_text,
    enrich,
)
from servico_ocr_spark.core.geometry import FaixaGeometryError

_WORDS = ["casa", "ação", "rio", "12", "justiça", "a", "foro", "nº",
          "relatório", "x1"]


@st.composite
def token_streams(draw):
    n_pages = draw(st.integers(1, 3))
    page_w = draw(st.sampled_from([2480, 2550, 2000, 1600]))
    page_h = draw(st.sampled_from([3508, 3300, 2000, 4200]))
    rows = []
    for page in range(n_pages):
        rows.append(dict(level=1, page_num=page, block_num=0, par_num=0,
                         line_num=0, word_num=0, left=0, top=0, width=page_w,
                         height=page_h, conf=-1, text=""))
        n_blocks = draw(st.integers(0, 6))
        for block in range(1, n_blocks + 1):
            x = draw(st.integers(0, page_w - 200))
            y = draw(st.integers(0, page_h - 120))
            bw = draw(st.integers(50, page_w - x))
            bh = draw(st.integers(40, 400))
            rows.append(dict(level=2, page_num=page, block_num=block,
                             par_num=0, line_num=0, word_num=0, left=x,
                             top=y, width=bw, height=bh, conf=-1, text=""))
            n_words = draw(st.integers(0, 8))
            for w in range(n_words):
                rows.append(dict(
                    level=5, page_num=page, block_num=block,
                    par_num=draw(st.integers(1, 2)),
                    line_num=draw(st.integers(1, 4)), word_num=w,
                    left=x + 10 * w, top=y + 3, width=80, height=40,
                    conf=draw(st.integers(-1, 99)),
                    text=draw(st.sampled_from(_WORDS)),
                ))
    return rows


@given(token_streams())
@settings(max_examples=150, deadline=None)
def test_kernel_invariants(rows):
    boxes, conf_sum, conf_count = assemble_boxes(list(rows))
    texts_before = sorted(b["texto"] for b in boxes)
    try:
        enriched, n_pages = enrich(boxes)
    except FaixaGeometryError:
        return  # replicated reference crash — routed to error side-output
    # conservation: sorting + column rewrite lose/duplicate nothing
    assert sorted(b["texto"] for b in enriched) == texts_before
    # contiguous global ids
    assert [b["id"] for b in enriched] == list(range(len(enriched)))
    # per-page ordinals restart at 0 and are contiguous
    page, expect = None, 0
    for b in enriched:
        if b["pagina"] != page:
            page, expect = b["pagina"], 0
        assert b["box"] == expect
        expect += 1
    # every box classified
    assert all(b["tipo"] in {"P", "C", "R", "T", "F", "E", "CT"}
               for b in enriched)
    # spans reconstruct the text
    text, spans = assemble_text(enriched)
    by_id = {b["id"]: b for b in enriched}
    for span in spans:
        assert text[span["start"]:span["end"]] == by_id[span["box_id"]]["texto"]


@given(token_streams())
@settings(max_examples=50, deadline=None)
def test_kernel_is_pure(rows):
    def run(r):
        boxes, _, _ = assemble_boxes([dict(x) for x in r])
        try:
            enriched, _ = enrich(boxes)
        except FaixaGeometryError:
            return "FAIXA"
        return [(b["id"], b["texto"], b["tipo"], tuple(b["box_xyla"]))
                for b in enriched]

    assert run(rows) == run(rows)


def test_simhash_pairs_equal_bruteforce_hamming(spark):
    """Pigeonhole completeness, differentially: the banded operator must
    return EXACTLY the pairs a brute-force O(n^2) hamming scan over the
    same signatures finds (banding is a pure candidate pruner — zero
    recall loss for max_hamming <= bands-1, zero false positives after
    verification)."""
    import itertools

    from servico_ocr_spark.operators import simhash, simhash_near_duplicates

    # deterministic corpus with clusters of near-identical word sets
    rows = []
    base_words = [f"w{i}" for i in range(24)]
    for d in range(30):
        words = list(base_words)
        # mutate a few words per doc so hamming distances spread 0..60
        for j in range(d % 7):
            words[j] = f"m{d}x{j}"
        rows.append((d, " ".join(words)))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    sigs = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
    brute = {
        (a, b)
        for a, b in itertools.combinations(sorted(sigs), 2)
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_duplicates(df, max_hamming=3).collect()
    }
    assert got == brute
    assert brute, "corpus must actually contain qualifying pairs"


def test_ngram_jaccard_equal_bruteforce(spark):
    """The shingle equi-join is complete for threshold > 0 (a qualifying
    pair shares at least one surviving shingle), so the operator must
    equal a brute-force O(n^2) jaccard over per-doc shingle sets —
    including under a binding df cap, applied identically to both."""
    import itertools

    from servico_ocr_spark.operators import ngram_jaccard_pairs
    from servico_ocr_spark.operators.common import h48  # noqa: F401 (parity via op)

    boiler = "termo de uso padrao aqui"  # shared by ALL docs -> df-capped
    rows = []
    for d in range(10):
        base = [f"g{d}w{k}" for k in range(12)]
        rows.append((2 * d, f"{boiler} " + " ".join(base)))
        rows.append(
            (2 * d + 1,
             f"{boiler} " + " ".join(base[:10] + [f"x{d}a", f"x{d}b"]))
        )
    df = spark.createDataFrame(rows, "doc_id long, text string")

    cap = 8

    def shingles(text):
        ws = text.split()
        return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}

    sets = {d: shingles(t) for d, t in rows}
    df_counts = {}
    for s in sets.values():
        for g in s:
            df_counts[g] = df_counts.get(g, 0) + 1
    capped = {d: {g for g in s if df_counts[g] <= cap} for d, s in sets.items()}
    brute = {}
    for a, b in itertools.combinations(sorted(capped), 2):
        inter = len(capped[a] & capped[b])
        union = len(capped[a]) + len(capped[b]) - inter
        if union and (inter * 100) // union >= 20:
            brute[(a, b)] = (inter * 100) // union
    got = {
        (r["id_a"], r["id_b"]): r["jaccard_pct"]
        for r in ngram_jaccard_pairs(
            df, n=3, threshold_pct=20, max_doc_freq=cap
        ).collect()
    }
    assert got == brute
    assert brute, "corpus must actually contain qualifying pairs"


def test_simhash_pairs_bruteforce_random_corpora(spark):
    """Same pigeonhole-completeness differential over seeded-random word
    sets (vocab mixing shared and doc-unique words) — catches band-split
    or hash-boundary bugs the structured corpus might mask."""
    import itertools
    import random

    from servico_ocr_spark.operators import simhash, simhash_near_duplicates

    for seed in (7, 23):
        rng = random.Random(seed)
        vocab = [f"v{k}" for k in range(40)]
        rows = []
        for d in range(25):
            k = rng.randint(3, 20)
            words = rng.sample(vocab, k) + [
                f"d{d}u{j}" for j in range(rng.randint(0, 3))
            ]
            rng.shuffle(words)
            rows.append((d, " ".join(words)))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        sigs = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
        brute = {
            (a, b)
            for a, b in itertools.combinations(sorted(sigs), 2)
            if bin(sigs[a] ^ sigs[b]).count("1") <= 3
        }
        got = {
            (r["id_a"], r["id_b"])
            for r in simhash_near_duplicates(df, max_hamming=3).collect()
        }
        assert got == brute, (seed, got ^ brute)


def test_chunk_documents_covers_every_token_exactly(spark):
    """Deterministic sweep over (n_words, chunk_size, overlap): chunks
    tile the token stream — starts advance by exactly stride, every token
    index falls in >= 1 chunk, consecutive full chunks overlap by exactly
    `overlap`, and total chunk tokens equal n + overlap*(n_chunks-1) only
    when every interior chunk is full (checked via per-chunk sizes)."""
    from servico_ocr_spark.operators import chunk_documents

    cases = [
        (n, cs, ov)
        for n in (0, 1, 7, 8, 9, 20, 33, 64)
        for cs, ov in ((8, 2), (8, 7), (5, 0), (16, 8))
    ]
    rows = [
        (i, " ".join(f"t{k}" for k in range(n)))
        for i, (n, _, _) in enumerate(cases)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    for i, (n, cs, ov) in enumerate(cases):
        out = sorted(
            (r["chunk_idx"], r["start_token"], r["n_tokens"])
            for r in chunk_documents(
                df.where(f"doc_id = {i}"), chunk_size=cs, overlap=ov
            ).collect()
        )
        stride = cs - ov
        if n == 0:
            assert out == []
            continue
        # starts advance by stride from 0
        assert [s for _, s, _ in out] == [
            j * stride for j in range(len(out))
        ]
        covered = set()
        for _, s, ln in out:
            assert 1 <= ln <= cs
            covered.update(range(s, s + ln))
        assert covered == set(range(n)), (n, cs, ov)
        # every chunk except possibly the last is full
        assert all(ln == cs for _, _, ln in out[:-1])
        # no fully-redundant tail: the last chunk contributes new tokens
        if len(out) > 1:
            assert out[-1][1] + out[-1][2] == n
            assert out[-1][1] > out[-2][1]


def test_asof_join_equals_bruteforce_bisect(spark):
    """Both as-of variants (shuffle union+window AND broadcast
    history-array) must equal a per-key Python bisect reference on a
    deterministic pseudo-random corpus — inclusive and strict tie
    semantics, keys with no history, and probes before any build row."""
    import bisect
    import datetime as dt
    import hashlib

    from servico_ocr_spark.operators import asof_join, asof_join_broadcast

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    t0 = dt.datetime(2024, 5, 1)
    # ~40 keys; ts drawn from a small grid so equal-ts probe/build ties
    # actually occur; key 999 appears only on the probe side
    build = [
        (h(f"b{i}k") % 40, t0 + dt.timedelta(minutes=h(f"b{i}t") % 500),
         i)
        for i in range(300)
    ]
    probe = [
        (i, (h(f"p{i}k") % 41) if i % 13 else 999,
         t0 + dt.timedelta(minutes=h(f"p{i}t") % 500))
        for i in range(400)
    ]
    bdf = spark.createDataFrame(
        build, "k long, ts timestamp, vid long"
    )
    pdf = spark.createDataFrame(
        probe, "pid long, k long, ts timestamp"
    )

    # Python reference: per key, (ts, vid)-sorted history; inclusive
    # match = rightmost entry with ts <= probe_ts (max vid on ts ties —
    # the operator's tie_break contract); strict = ts < probe_ts
    hist = {}
    for k, ts, vid in build:
        hist.setdefault(k, []).append((ts, vid))
    for k in hist:
        hist[k].sort()

    def ref(inclusive):
        out = {}
        for pid, k, ts in probe:
            rows = hist.get(k, [])
            idx = (
                bisect.bisect_right(rows, (ts, float("inf")))
                if inclusive
                else bisect.bisect_left(rows, (ts, -1))
            )
            out[pid] = rows[idx - 1][1] if idx else None
        return out

    for inclusive in (True, False):
        expected = ref(inclusive)
        got_shuffle = {
            r["pid"]: r["asof_vid"]
            for r in asof_join(
                pdf, bdf, on="k", probe_ts="ts", build_ts="ts",
                value_cols=["vid"], inclusive=inclusive,
                tie_break="vid",
            ).collect()
        }
        assert got_shuffle == expected, f"shuffle inclusive={inclusive}"
    # broadcast variant: inclusive only (it has no tie_break parameter;
    # sort_array puts the max-vid struct last on ts ties, matching)
    got_bcast = {
        r["pid"]: r["asof_vid"]
        for r in asof_join_broadcast(
            pdf, bdf, on="k", probe_ts="ts", build_ts="ts",
            value_cols=["vid"],
        ).collect()
    }
    assert got_bcast == ref(True)
    # the corpus must actually exercise ties and misses
    assert any(v is None for v in ref(True).values())
    assert ref(True) != ref(False), "no equal-ts tie occurred"


def test_triangle_counts_equals_bruteforce(spark):
    """Degree-oriented wedge counting must equal a brute-force Python
    triangle enumeration on a pseudo-random directed multigraph with
    self-loops and reverse duplicates."""
    import hashlib
    import itertools

    from servico_ocr_spark.operators import triangle_counts

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    edges = [
        (f"n{h(f'{i}s') % 25}", f"n{h(f'{i}d') % 25}")
        for i in range(400)
    ]
    df = spark.createDataFrame(edges, "src string, dst string")

    und = {frozenset(e) for e in edges if e[0] != e[1]}
    adj = {}
    for e in und:
        a, b = sorted(e)
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expected = {n: 0 for n in adj}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if (
            b in adj[a] and c in adj[a] and c in adj[b]
        ):
            expected[a] += 1
            expected[b] += 1
            expected[c] += 1
    got = {
        r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()
    }
    assert got == expected
    assert sum(expected.values()) > 0, "graph must contain triangles"


def test_kmeans_equals_pure_python_lloyd(spark):
    """The distributed k-means must equal an independent pure-Python
    Lloyd implementation with the same integer contract (quantize,
    truncating means, min-(d2,cid) ties, empty-cluster keep) — the
    DuckDB oracle shares the relational algebra, this reference does
    not."""
    import hashlib
    import math

    from servico_ocr_spark.operators import kmeans_lite

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    dims, k, iters = 6, 3, 3
    rows = [
        (
            i,
            [((h(f"{i}.{d}") % 2001) - 1000) / 1000.0 for d in range(dims)],
        )
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    # independent reference (note: quantization goes through float32
    # like the parquet/Spark path — struct trick via numpy)
    import numpy as np

    q = {
        i: [int(math.floor(float(np.float32(x)) * 1000)) for x in v]
        for i, v in rows
    }
    cent = {c: list(q[c]) for c in range(k)}

    def assign():
        out = {}
        for i, v in q.items():
            best = min(
                (sum((a - b) ** 2 for a, b in zip(v, cent[c])), c)
                for c in cent
            )
            out[i] = (best[1], best[0])
        return out

    for _ in range(iters):
        a = assign()
        sums = {}
        for i, (c, _d) in a.items():
            s = sums.setdefault(c, [0] * dims + [0])
            for d in range(dims):
                s[d] += q[i][d]
            s[dims] += 1
        for c in cent:
            if c in sums:
                n = sums[c][dims]
                # exact integer truncation toward zero, matching
                # Spark `div` / DuckDB `//` (NOT Python floor //)
                cent[c] = [
                    sums[c][d] // n if sums[c][d] >= 0
                    else -((-sums[c][d]) // n)
                    for d in range(dims)
                ]
    expected = {
        i: (c, d2) for i, (c, d2) in assign().items()
    }
    got = {
        r["vec_id"]: (r["cluster"], r["d2"])
        for r in kmeans_lite(df, k=k, iterations=iters).collect()
    }
    assert got == expected


def test_winnow_guarantee_over_random_corpora(spark):
    """Winnowing's paper guarantee, fuzzed: for ANY pair of docs sharing
    a token run of length >= window + k - 1, the fingerprint sets
    intersect; and per-doc fingerprints match the brute-force rightmost-
    min selection exactly (md5-arithmetic corpora, 3 seeds)."""
    import hashlib

    from servico_ocr_spark.operators import winnow_fingerprints

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    K, W = 3, 4
    for seed in range(3):
        vocab = [f"w{v}" for v in range(12)]
        shared = " ".join(vocab[h(f"{seed}s{j}") % 12] for j in range(W + K - 1))
        docs = []
        for i in range(30):
            n = h(f"{seed}.{i}") % 14 + 2
            toks = [vocab[h(f"{seed}.{i}.{j}") % 12] for j in range(n)]
            text = " ".join(toks)
            if i % 5 == 0:  # embed the shared run at a varying offset
                cut = h(f"{seed}c{i}") % (len(toks) + 1)
                text = " ".join(toks[:cut] + [shared] + toks[cut:])
            docs.append((i, text))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        rows = winnow_fingerprints(df, k=K, window=W).collect()
        got = {(r["doc_id"], r["fp_pos"], r["fp_h48"]) for r in rows}

        # brute-force reference
        def h48(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)

        want = set()
        for did, text in docs:
            ws = [x for x in text.split(" ") if x]
            grams = [h48(" ".join(ws[i:i + K]))
                     for i in range(len(ws) - K + 1)]
            g = len(grams)
            for i in range(max(g - W, 0) + 1):
                win = grams[i:i + W]
                if not win:
                    continue
                m = min(win)
                j = i + max(o for o, v in enumerate(win) if v == m)
                want.add((did, j, grams[j]))
        assert got == want
        # guarantee: every carrier pair shares >= 1 fingerprint
        carriers = [d for d, t in docs if d % 5 == 0]
        fsets = {d: {fp for dd, _, fp in got if dd == d} for d in carriers}
        for a in carriers:
            for b in carriers:
                if a < b:
                    assert fsets[a] & fsets[b], (seed, a, b)


def test_skipgram_pairs_symmetric_and_nested_subsampling(spark):
    """For ANY corpus: (1) pair counts are symmetric; (2) raising the
    subsample threshold only ADDS kept occurrences (nesting in the
    hash-threshold sense does not hold for pairs — dropping a middle
    word can CREATE bridged pairs — but total pair mass grows)."""
    import hashlib

    from servico_ocr_spark.operators import skipgram_pairs

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    for seed in range(2):
        docs = [
            (i, " ".join(
                f"t{h(f'{seed}.{i}.{j}') % 9}"
                for j in range(h(f"{seed}.{i}") % 12)
            ))
            for i in range(40)
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        lo = {(r["center"], r["context"]): r["n_pairs"]
              for r in skipgram_pairs(df, subsample_ppm=30_000).collect()}
        hi = {(r["center"], r["context"]): r["n_pairs"]
              for r in skipgram_pairs(df, subsample_ppm=1_000_000).collect()}
        for (a, b), n in lo.items():
            assert lo[(b, a)] == n
        assert sum(hi.values()) >= sum(lo.values())


def test_ilog_bucket_properties_bulk(spark):
    """The shared integer log-bucket primitive
    (stats.with_ilog_bucket): for a dense sweep plus adversarial
    power-of-two boundary values, (1) bucket == k·e + j with e the
    EXACT integer log2 (self-correction heals any float ulp error),
    (2) monotone non-decreasing in v, (3) lower-bound inversion
    est ≤ v < est·(1+1/k)+2."""
    from pyspark.sql import functions as F

    from servico_ocr_spark.operators.stats import with_ilog_bucket

    vals = sorted(
        set(
            list(range(1, 600))
            + [2**e for e in range(1, 50)]
            + [2**e - 1 for e in range(2, 50)]
            + [2**e + 1 for e in range(1, 50)]
            + [3 ** e for e in range(1, 30)]
        )
    )
    k = 8
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    out = {
        r["v"]: r["b"]
        for r in with_ilog_bucket(df, "v", "b", k).collect()
    }
    prev = -1
    for v in vals:
        b = out[v]
        e = v.bit_length() - 1
        p = 1 << e
        assert b == e * k + ((v - p) * k) // p, (v, b)
        assert b >= prev
        prev = b
        # lower-bound inversion
        eb, jb = b // k, b % k
        pb = 1 << eb
        est = pb + (jb * pb + k - 1) // k
        assert est <= v <= est + est // k + 2, (v, est)
