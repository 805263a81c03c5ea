"""SymSpell-style distance-1 linkage (operators/linkage.py)."""

import pytest


def _lev(a, b):
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[n]


def _brute_pairs(titles):
    from collections import Counter

    c = Counter(titles)
    ts = sorted(c)
    out = set()
    for i, a in enumerate(ts):
        for b in ts[i + 1:]:
            if _lev(a, b) == 1:
                out.add((a, b, c[a], c[b], 1))
    return out


TITLES = [
    "crawl report nr 12",
    "crawl report nr 12",   # exact dup: a count, never a pair
    "crawl repart nr 12",   # substitution -> dist 1
    "crawl reports nr 12",  # insertion -> dist 1
    "crawl report nr 13",   # digit substitution -> dist 1
    "crawl report nr 31",   # vs 13: transposition = dist 2, NOT a pair
    "totally different",
    "ab",
    "ba",                   # shares deletions with 'ab' but dist 2
    "b",                    # dist 1 to both 'ab' and 'ba' (deletion)
]


def test_edit1_linkage_matches_brute_force(spark):
    from servico_ocr_spark.operators import edit1_linkage

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TITLES)], ["doc_id", "title"]
    )
    got = {
        (r["s_a"], r["s_b"], r["n_a"], r["n_b"], r["dist"])
        for r in edit1_linkage(df).collect()
    }
    want = _brute_pairs(TITLES)
    assert got == want
    # the dist-2 shared-deletion traps were generated as candidates but
    # verified away
    assert ("ab", "ba", 1, 1, 1) not in got
    assert ("ab", "b", 1, 1, 1) in got and ("b", "ba", 1, 1, 1) in got


def test_edit1_linkage_partitioning_independence(spark):
    from servico_ocr_spark.operators import edit1_linkage

    rows = [(i, f"item {i % 23:03d}") for i in range(180)]
    base = None
    for parts in (1, 7):
        df = spark.createDataFrame(rows, ["doc_id", "title"]).repartition(
            parts
        )
        got = sorted(
            (r["s_a"], r["s_b"], r["n_a"], r["n_b"], r["dist"])
            for r in edit1_linkage(df).collect()
        )
        if base is None:
            base = got
        else:
            assert got == base
    want = sorted(_brute_pairs([t for _, t in rows]))
    assert base == want


def test_edit1_linkage_key_df_cap_binds(spark):
    """A hot variant key (many strings one deletion from a shared stem)
    is dropped by max_key_df; candidates met ONLY on that key are lost
    — the documented recall trade, verified both ways."""
    from servico_ocr_spark.operators import edit1_linkage

    # 'x0'..'x9' all share deletion key 'x' (10 strings on one key);
    # pairwise they are dist-1 substitutions met on key 'x' only
    rows = [(i, f"x{i}") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "title"])
    full = edit1_linkage(df).count()
    assert full == 45  # all C(10,2) pairs are dist 1
    capped = edit1_linkage(df, max_key_df=5).count()
    assert capped < full
