"""Training-set assembly operators (operators/packing.py)."""

from __future__ import annotations

import pytest

from servico_ocr_spark.operators import assign_split, pack_sequences


def test_assign_split_percent_validation(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        assign_split(df, splits=[("train", 90), ("val", 5)])


def test_assign_split_covers_all_rows_roughly_proportionally(spark):
    df = spark.createDataFrame(
        [(i, "t") for i in range(2000)], ["doc_id", "text"]
    )
    counts = dict(
        (r["split"], r["count"])
        for r in assign_split(df, splits=[("train", 80), ("val", 20)])
        .groupBy("split")
        .count()
        .collect()
    )
    assert set(counts) == {"train", "val"}
    assert sum(counts.values()) == 2000
    # 48-bit hash bucketing: 20% ± generous tolerance on 2000 ids
    assert 300 <= counts["val"] <= 500


def test_assign_split_stable_under_corpus_growth(spark):
    small = spark.createDataFrame(
        [(i, "t") for i in range(100)], ["doc_id", "text"]
    )
    big = spark.createDataFrame(
        [(i, "t") for i in range(300)], ["doc_id", "text"]
    )
    s_small = {
        r["doc_id"]: r["split"] for r in assign_split(small).collect()
    }
    s_big = {r["doc_id"]: r["split"] for r in assign_split(big).collect()}
    # the hash makes the split a property of the id: growth never
    # reassigns existing documents
    assert all(s_big[i] == s_small[i] for i in s_small)


def test_assign_split_plan_is_pure_projection(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    plan = assign_split(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pack_sequences_arithmetic_single_shard(spark):
    # token counts: 3, 4, 5, 2 in doc_id order; capacity 6
    rows = [
        (1, "a b c"),
        (2, "a b c d"),
        (3, "a b c d e"),
        (4, "a b"),
    ]
    out = {
        r["doc_id"]: r
        for r in pack_sequences(
            spark.createDataFrame(rows, ["doc_id", "text"]),
            capacity=6,
            n_shards=1,
        ).collect()
    }
    # cumulative-before: 0, 3, 7, 12
    assert (out[1]["pack_seq"], out[1]["pack_offset"]) == (0, 0)
    assert (out[2]["pack_seq"], out[2]["pack_offset"]) == (0, 3)
    assert (out[3]["pack_seq"], out[3]["pack_offset"]) == (1, 1)
    assert (out[4]["pack_seq"], out[4]["pack_offset"]) == (2, 0)
    assert [out[i]["n_tokens"] for i in (1, 2, 3, 4)] == [3, 4, 5, 2]
    assert all(out[i]["shard"] == 0 for i in out)


def test_pack_sequences_shards_partition_the_stream(spark):
    df = spark.createDataFrame(
        [(i, "w " * (i % 7 + 1)) for i in range(200)], ["doc_id", "text"]
    )
    out = pack_sequences(df, capacity=16, n_shards=4).collect()
    assert len(out) == 200
    assert {r["shard"] for r in out} <= {0, 1, 2, 3}
    # within each shard, offsets obey the concat-and-chunk recurrence
    by_shard = {}
    for r in sorted(out, key=lambda r: (r["shard"], r["doc_id"])):
        cum = by_shard.get(r["shard"], 0)
        assert r["pack_seq"] == cum // 16
        assert r["pack_offset"] == cum % 16
        by_shard[r["shard"]] = cum + r["n_tokens"]


def test_pack_sequences_capacity_validation(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        pack_sequences(df, capacity=0)


def _mix_corpus(spark, spec):
    """spec: list of (stratum, n_docs, tokens_per_doc)."""
    rows, i = [], 0
    for stratum, n, tok in spec:
        for _ in range(n):
            rows.append((i, stratum, "w " * tok))
            i += 1
    return spark.createDataFrame(rows, ["doc_id", "source", "text"])


def test_token_budget_mix_validation(spark):
    from servico_ocr_spark.operators import token_budget_mix

    df = _mix_corpus(spark, [("a", 1, 1)])
    with pytest.raises(ValueError):
        token_budget_mix(df, budget=-1)
    with pytest.raises(ValueError):
        token_budget_mix(df, budget=1, weights={})
    with pytest.raises(ValueError):
        token_budget_mix(df, budget=1, weights={"a": -2})


def test_token_budget_mix_uniform_hits_budget(spark):
    from servico_ocr_spark.operators import token_budget_mix

    df = _mix_corpus(spark, [("a", 200, 5), ("b", 200, 5)])
    out = token_budget_mix(df, budget=1000).collect()
    # exact integer rate: 1000 * 1 * 10000 div (2 * 1000) = 5000
    assert {r["rate_pp"] for r in out} == {5000}
    for s in ("a", "b"):
        kept = sum(r["n_tokens"] for r in out if r["stratum"] == s)
        # target 500 tokens/stratum; binomial noise over 200 keep draws
        assert 350 <= kept <= 650


def test_token_budget_mix_weighted_recipe(spark):
    from servico_ocr_spark.operators import token_budget_mix

    df = _mix_corpus(
        spark, [("a", 100, 4), ("b", 100, 4), ("c", 10, 2), ("d", 50, 3)]
    )
    out = token_budget_mix(
        df, budget=400, weights={"a": 2, "b": 1, "c": 1}
    ).collect()
    rates = {}
    for r in out:
        rates.setdefault(r["stratum"], set()).add(r["rate_pp"])
    # d is not in the recipe: allowlist semantics drop it entirely
    assert "d" not in rates
    # exact rates: a = 400*2*10000 div (4*400) = 5000, b = 2500;
    # c's target (100 tokens) exceeds its 20-token supply -> cap (keep all)
    assert rates["a"] == {5000}
    assert rates["b"] == {2500}
    assert rates["c"] == {10000}
    assert sum(1 for r in out if r["stratum"] == "c") == 10


def test_token_budget_mix_empty_stratum_keeps_all(spark):
    from servico_ocr_spark.operators import token_budget_mix

    df = spark.createDataFrame(
        [(1, "a", ""), (2, "a", ""), (3, "b", "w w w")],
        ["doc_id", "source", "text"],
    )
    out = token_budget_mix(df, budget=3).collect()
    a_rows = [r for r in out if r["stratum"] == "a"]
    # zero-supply stratum: rate caps at keep-everything (the min(1, .)
    # limit), rows ride through with n_tokens = 0
    assert len(a_rows) == 2
    assert {r["rate_pp"] for r in a_rows} == {10000}
    assert {r["n_tokens"] for r in a_rows} == {0}


def test_token_budget_mix_deterministic_and_keep_stable_at_fixed_rate(spark):
    from servico_ocr_spark.operators import token_budget_mix

    df = _mix_corpus(spark, [("a", 150, 3)])
    out1 = sorted(r["doc_id"] for r in token_budget_mix(df, 225).collect())
    out2 = sorted(r["doc_id"] for r in token_budget_mix(df, 225).collect())
    assert out1 == out2
    # doubling the budget doubles the rate; the kept set GROWS
    # monotonically (hash-threshold sampling nests by construction)
    big = sorted(r["doc_id"] for r in token_budget_mix(df, 450).collect())
    assert set(out1) <= set(big)


def test_token_budget_mix_plan_broadcasts_rates(spark):
    from servico_ocr_spark.operators import token_budget_mix

    df = _mix_corpus(spark, [("a", 20, 3), ("b", 20, 3)])
    plan = (
        token_budget_mix(df, budget=60)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the rates relation (#strata rows) must come back as a broadcast,
    # never a sort-merge shuffle of the document side
    assert "Broadcast" in plan
    assert "SortMergeJoin" not in plan


def test_chunk_documents_boundaries_and_edges(spark):
    from servico_ocr_spark.operators import chunk_documents

    w = lambda n: " ".join(f"t{i}" for i in range(n))  # noqa: E731
    df = spark.createDataFrame(
        [
            (0, ""),          # empty -> no chunks
            (1, w(5)),        # short -> one chunk of 5
            (2, w(8)),        # exactly chunk_size -> one chunk
            (3, w(9)),        # one past -> two chunks (second short)
            (4, w(20)),       # 8/stride 6 -> chunks at 0,6,12 -> 3 chunks
        ],
        ["doc_id", "text"],
    )
    out = chunk_documents(df, chunk_size=8, overlap=2)
    rows = sorted(
        (r["doc_id"], r["chunk_idx"], r["start_token"], r["n_tokens"])
        for r in out.collect()
    )
    assert rows == [
        (1, 0, 0, 5),
        (2, 0, 0, 8),
        (3, 0, 0, 8), (3, 1, 6, 3),
        (4, 0, 0, 8), (4, 1, 6, 8), (4, 2, 12, 8),
    ]


def test_chunk_documents_overlap_is_real_and_hashes_distinct(spark):
    from servico_ocr_spark.operators import chunk_documents
    from servico_ocr_spark.operators.common import h48, words_array
    from pyspark.sql import functions as F

    text = " ".join(f"w{i}" for i in range(30))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    out = chunk_documents(df, chunk_size=10, overlap=4).collect()
    # stride 6: starts 0,6,12,18 -> ceil((30-10)/6)+1 = 5? (30-10+5)//6+1=5
    starts = sorted(r["start_token"] for r in out)
    assert starts == [0, 6, 12, 18, 24]
    # chunk hash equals the hash of the slice it claims to cover
    expected = df.select(
        h48(
            F.array_join(
                F.slice(words_array(F.col("text")), 13, 10), " "
            )
        ).alias("h")
    ).collect()[0]["h"]
    by_start = {r["start_token"]: r for r in out}
    assert by_start[12]["chunk_h48"] == expected
    assert len({r["chunk_h48"] for r in out}) == len(out)
    # last chunk is the short tail: tokens 24..29
    assert by_start[24]["n_tokens"] == 6


def test_chunk_documents_zero_shuffle_and_validation(spark):
    import pytest as _pytest
    from servico_ocr_spark.operators import chunk_documents

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    plan = (
        chunk_documents(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Window" not in plan
    with _pytest.raises(ValueError):
        chunk_documents(df, chunk_size=8, overlap=8)


def test_stratified_sample_exact_k_and_determinism(spark):
    from servico_ocr_spark.operators import stratified_sample

    rows = [(i, f"src{i % 3}") for i in range(200)] + [(900, "tiny")]
    base = None
    for parts in (1, 7):
        df = spark.createDataFrame(rows, ["doc_id", "source"]).repartition(
            parts
        )
        got = sorted(
            (r["stratum"], r["doc_id"], r["rk"])
            for r in stratified_sample(df, k=10).collect()
        )
        if base is None:
            base = got
        else:
            assert got == base
    from collections import Counter
    per = Counter(s for s, _, _ in base)
    # full strata give exactly k; the 1-row stratum gives all of it
    assert per == {"src0": 10, "src1": 10, "src2": 10, "tiny": 1}
    # ranks are 1..k within each stratum
    ranks = {}
    for s, _, rk in base:
        ranks.setdefault(s, []).append(rk)
    assert all(sorted(v) == list(range(1, len(v) + 1))
               for v in ranks.values())


def test_stratified_sample_nesting(spark):
    """rk <= j of the k-sample IS the j-sample: shrinking the sample
    size never reshuffles who is in it (eval sets stay stable)."""
    from servico_ocr_spark.operators import stratified_sample

    df = spark.createDataFrame(
        [(i, f"s{i % 2}") for i in range(100)], ["doc_id", "source"]
    )
    big = stratified_sample(df, k=20).collect()
    small = stratified_sample(df, k=5).collect()
    big_set = {(r["stratum"], r["doc_id"], r["rk"]) for r in big
               if r["rk"] <= 5}
    small_set = {(r["stratum"], r["doc_id"], r["rk"]) for r in small}
    assert big_set == small_set


def test_stratified_sample_validates_k(spark):
    from servico_ocr_spark.operators import stratified_sample

    df = spark.createDataFrame([(1, "x")], ["doc_id", "source"])
    with pytest.raises(ValueError):
        stratified_sample(df, k=0)


def test_negative_sampling_contract(spark):
    from servico_ocr_spark.operators import negative_sampling

    # sparse, unordered id domain: dense-rank encoding must handle it
    ids = [7, 100, 3, 42, 999, 12, 55]
    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    base = None
    for parts in (1, 5):
        got = sorted(
            (r["anchor"], r["j"], r["negative"])
            for r in negative_sampling(
                df.repartition(parts), m=3
            ).collect()
        )
        if base is None:
            base = got
        else:
            assert got == base  # partitioning-independent
    # m rows per anchor, negative never the anchor, negatives in-corpus
    assert len(base) == len(ids) * 3
    dom = {str(i) for i in ids}
    per = {}
    for a, j, neg in base:
        assert a in dom and neg in dom and neg != a
        per.setdefault(a, set()).add(j)
    assert all(js == {1, 2, 3} for js in per.values())


def test_negative_sampling_single_row_and_validation(spark):
    from servico_ocr_spark.operators import negative_sampling

    one = spark.createDataFrame([(1,)], ["doc_id"])
    assert negative_sampling(one, m=2).count() == 0  # no valid negative
    with pytest.raises(ValueError):
        negative_sampling(one, m=0)


def test_epoch_upsample_regimes_and_nesting(spark):
    import hashlib

    from pyspark.sql import functions as F
    from servico_ocr_spark.operators import epoch_upsample

    docs = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(300)],
        "doc_id long, source string",
    )
    rates = {"s0": 25_000, "s1": 10_000, "s2": 4_000}
    got = epoch_upsample(docs, rates).collect()
    rows = {(r["doc_id"], r["epoch_ix"]): (r["stratum"], r["n_copies"])
            for r in got}

    def h48(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)

    # independent mirror
    want = {}
    for i in range(300):
        s = f"s{i % 3}"
        rate = rates[s]
        n = rate // 10_000 + (1 if h48(f"ep:{i}") % 10_000 < rate % 10_000
                              else 0)
        for e in range(1, n + 1):
            want[(i, e)] = (s, n)
    assert rows == want
    # regimes: s0 docs appear 2 or 3 times; s1 exactly once; s2 0/1
    per_doc = {}
    for (i, _), (s, n) in rows.items():
        per_doc[i] = (s, n)
    counts = {s: set() for s in rates}
    for i in range(300):
        s = f"s{i % 3}"
        counts[s].add(per_doc.get(i, (s, 0))[1])
    assert counts["s0"] == {2, 3}
    assert counts["s1"] == {1}
    assert counts["s2"] == {0, 1}
    # expected mass ~ rate: s0 mean copies in [2,3]
    s0 = [n for i, (s, n) in per_doc.items() if s == "s0"]
    assert 2 < sum(s0) / len(s0) < 3


def test_span_corruption_matches_python_and_reconstructs(spark):
    import hashlib
    import re

    from servico_ocr_spark.operators import span_corruption

    def h48(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)

    docs = [(i, " ".join(f"w{(i * j + j) % 7}" for j in range((i % 15))))
            for i in range(60)]  # includes zero-token docs (i % 15 == 0)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in span_corruption(df).collect()}

    for did, text in docs:
        ws = [x for x in text.split(" ") if x]
        m = [h48(f"t5:{did}:{p}") % 100 < 15 for p in range(len(ws))]
        r = got[did]
        assert r["n_tokens"] == len(ws)
        assert r["n_masked"] == sum(m)
        spans = sum(1 for p in range(len(ws))
                    if m[p] and (p == 0 or not m[p - 1]))
        assert r["n_spans"] == spans
        # reconstruction: substituting each <extra_id_k> in the input
        # with target span k yields the original text
        tgt_spans = {}
        if r["target_text"]:
            parts = re.split(r"<extra_id_(\d+)> ", r["target_text"])
            # parts = ['', k0, span0, k1, span1, ...]
            for j in range(1, len(parts), 2):
                tgt_spans[int(parts[j])] = parts[j + 1].rstrip()
        out = r["input_text"]
        for k in sorted(tgt_spans, reverse=True):
            out = out.replace(f"<extra_id_{k}>", tgt_spans[k])
        assert out == " ".join(ws), (did, r)
    # corpus exercises multi-token spans and clean docs
    assert any(r["n_spans"] < r["n_masked"] for r in got.values())
    assert any(r["n_masked"] == 0 and r["n_tokens"] > 0
               for r in got.values())


def test_weighted_sample_bias_nesting_and_clamp(spark):
    from servico_ocr_spark.operators import weighted_sample

    # one stratum, 200 rows: even ids carry weight 1000, odd ids 1
    rows = [(i, "s", 1000 if i % 2 == 0 else 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string, w long")
    picked = weighted_sample(
        df, k=40, weight_col="w", salt="bias-test"
    ).collect()
    assert len(picked) == 40
    heavy = sum(1 for r in picked if r["doc_id"] % 2 == 0)
    # heavy rows are half the population but must dominate the sample
    # (pairwise win prob 1 - 1/2000 against light rows)
    assert heavy >= 35, heavy
    # nesting: the k=10 sample is exactly the rk<=10 prefix of k=40
    small = {
        r["doc_id"]
        for r in weighted_sample(
            df, k=10, weight_col="w", salt="bias-test"
        ).collect()
    }
    assert small == {r["doc_id"] for r in picked if r["rk"] <= 10}
    # zero/negative weights clamp to 1, never crash
    df2 = spark.createDataFrame(
        [(1, "s", 0), (2, "s", -5), (3, "s", 7)],
        "doc_id long, source string, w long",
    )
    out = weighted_sample(df2, k=3, weight_col="w").collect()
    assert {r["weight"] for r in out} == {1, 7}


def test_pack_efficiency_consistent_with_pack_sequences(spark):
    """Telemetry-twin consistency: pack_efficiency's per-shard pack
    count must equal the packs pack_sequences actually produces
    (max pack_seq + spill of the shard's last doc), waste < capacity
    per shard, and token totals tie out."""
    from pyspark.sql import functions as F

    from servico_ocr_spark.operators import pack_efficiency, pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range((i * 13) % 37 + 1)))
         for i in range(120)],
        "doc_id long, text string",
    )
    cap, shards = 50, 4
    eff = {r["shard"]: r for r in
           pack_efficiency(docs, capacity=cap, n_shards=shards).collect()}
    seq = pack_sequences(docs, capacity=cap, n_shards=shards).collect()
    per_shard_tokens = {}
    last_end = {}
    for r in seq:
        per_shard_tokens[r["shard"]] = (
            per_shard_tokens.get(r["shard"], 0) + r["n_tokens"]
        )
    for s, tot in per_shard_tokens.items():
        e = eff[s]
        assert e["n_tokens"] == tot
        assert e["n_packs"] == (tot + cap - 1) // cap
        assert 0 <= e["waste_tokens"] < cap
        assert e["fill_ppm"] > 0
    assert sum(e["n_docs"] for e in eff.values()) == 120
