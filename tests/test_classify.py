"""Integer Bernoulli NB classifier: Python-mirror parity, all four
confusion cells on a noisy constructed corpus, empty-doc restoration,
and the hashing-trick dedup contract."""

import hashlib

import pytest
from pyspark.sql import functions as F

from servico_ocr_spark.operators import (
    hashed_features,
    nb_confusion,
    nb_score,
    nb_train,
)
from servico_ocr_spark.operators.classify import NB_SEED


def _h48(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


K = 8


def _bucket(v, k=K):
    v = max(v, 1)
    e = v.bit_length() - 1
    p = 1 << e
    return e * k + ((v - p) * k) // p


def _py_nb(train, score, dims):
    """Pure-Python mirror of nb_train + nb_score."""
    def feats(text):
        ws = {w for w in text.lower().split() if w}
        return {_h48(NB_SEED + w) % dims for w in ws}

    npos = sum(y for _, _, y in train)
    nneg = len(train) - npos
    pos_df, neg_df = {}, {}
    for _, text, y in train:
        for d in feats(text):
            tgt = pos_df if y else neg_df
            tgt[d] = tgt.get(d, 0) + 1
    prior = _bucket(npos + 1) - _bucket(nneg + 1)

    def llr(d):
        return (_bucket(pos_df.get(d, 0) + 1) + _bucket(nneg + 2)) - (
            _bucket(neg_df.get(d, 0) + 1) + _bucket(npos + 2)
        )

    out = {}
    for did, text, _ in score:
        s = prior + sum(llr(d) for d in feats(text))
        out[did] = (s, 1 if s > 0 else 0)
    return out


def _noisy_corpus():
    """Signal word 'good' predicts y=1, with deterministic label noise
    both ways so tp/fp/fn/tn are ALL live."""
    rows = []
    for i in range(120):
        has = i % 3 == 0
        base = "good stuff here" if has else "plain filler text"
        text = f"{base} common shared words w{i % 7}"
        y = 1 if has else 0
        if i % 20 == 0:      # flip some positives → fp (pred 1, label 0)
            y = 1 - y if has else y
        if i % 20 == 7 and not has:   # flip some negatives → fn
            y = 1
        rows.append((i, text, y))
    return rows


def test_nb_matches_python_mirror_and_all_cells_live(spark):
    rows = _noisy_corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string, y long")
    train_df = df.where("doc_id % 4 != 0")
    w = nb_train(train_df, dims=64)
    scored = nb_score(df, w, dims=64)
    got = {
        r["doc_id"]: (r["score"], r["pred"]) for r in scored.collect()
    }
    train = [rows[i] for i in range(120) if i % 4 != 0]
    exp = _py_nb(train, rows, 64)
    assert got == exp

    labeled = df.withColumn(
        "split", F.when(F.col("doc_id") % 4 == 0, "test").otherwise("train")
    )
    cm = {
        (r["split"], r["y_true"], r["y_pred"]): r["n_docs"]
        for r in nb_confusion(scored, labeled).collect()
    }
    # all four cells live on at least the train split
    for cell in [(1, 1), (0, 0), (0, 1), (1, 0)]:
        assert any(c[1:] == cell for c in cm), (cell, cm)
    assert sum(cm.values()) == 120


def test_nb_score_restores_zero_feature_docs(spark):
    df = spark.createDataFrame(
        [(1, "signal word", 1), (2, "other thing", 0), (3, "", 0)],
        "doc_id long, text string, y long",
    )
    w = nb_train(df, dims=32)
    out = {r["doc_id"]: r for r in nb_score(df, w, dims=32).collect()}
    assert set(out) == {1, 2, 3}
    # the empty doc scores exactly the prior
    prior = _bucket(1 + 1) - _bucket(2 + 1)
    assert out[3]["score"] == prior


def test_hashed_features_dedupe_after_hashing(spark):
    # two distinct words forced into the same dim (dims=1) → ONE row
    df = spark.createDataFrame([(1, "alpha beta")], "doc_id long, text string")
    rows = hashed_features(df, dims=1).collect()
    assert len(rows) == 1 and rows[0]["dim"] == 0


# ---------------------------------------------------------------------------
# DSIR importance weights
# ---------------------------------------------------------------------------

from servico_ocr_spark.operators import dsir_features, dsir_weights  # noqa: E402
from servico_ocr_spark.operators.classify import DSIR_SEED  # noqa: E402


def _py_dsir(rows, target_ids, dims):
    """Pure-Python mirror of dsir_weights (hashed unigram+bigram counts,
    ilog-bucket importance)."""
    def feats(text):
        ws = [w for w in text.lower().split() if w]
        grams = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        out = {}
        for g in grams:
            d = _h48(DSIR_SEED + g) % dims
            out[d] = out.get(d, 0) + 1
        return out

    rb, tb = {}, {}
    for did, text in rows:
        for d, c in feats(text).items():
            rb[d] = rb.get(d, 0) + c
            if did in target_ids:
                tb[d] = tb.get(d, 0) + c
    rtot, ttot = sum(rb.values()), sum(tb.values())
    norm = _bucket(rtot + dims) - _bucket(ttot + dims)
    out = {}
    for did, text in rows:
        f = feats(text)
        n_feat = sum(f.values())
        s1 = sum(
            c * (_bucket(tb.get(d, 0) + 1) - _bucket(rb[d] + 1))
            for d, c in f.items()
        )
        out[did] = (n_feat, s1 + n_feat * norm if n_feat else 0)
    return out


def _dsir_corpus():
    """Target docs use a disjoint content vocabulary, so the importance
    weight separates them perfectly — the clean demonstration corpus
    (the sf fixture's 31-word background makes separation statistical,
    not exact; see _q_dsir_weights)."""
    rows = []
    for i in range(60):
        if i % 5 == 0:
            text = f"quantum flux capacitor resonance w{i % 3}"
        else:
            text = f"plain filler common words here w{i % 3}"
        rows.append((i, text))
    rows.append((60, ""))  # zero-token doc
    return rows


def test_dsir_matches_python_mirror(spark):
    rows = _dsir_corpus()
    tgt = {i for i, _ in rows if i % 5 == 0}
    df = spark.createDataFrame(rows, "doc_id long, text string")
    target = df.where(F.col("doc_id") % 5 == 0).select("doc_id")
    got = {
        r["doc_id"]: (r["n_feat"], r["dsir_w"])
        for r in dsir_weights(df, target_ids=target, dims=64).collect()
    }
    assert got == _py_dsir(rows, tgt, 64)


def test_dsir_selects_target_like_docs(spark):
    rows = _dsir_corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    target = df.where(F.col("doc_id") % 5 == 0).select("doc_id")
    out = dsir_weights(df, target_ids=target, dims=64).collect()
    t_ws = [r["dsir_w"] for r in out if r["doc_id"] % 5 == 0
            and r["doc_id"] <= 60]
    o_ws = [r["dsir_w"] for r in out if r["doc_id"] % 5 != 0]
    # perfect separation on the disjoint-vocabulary corpus: resampling
    # the top |target| docs recovers exactly the target-like set
    assert min(t_ws) > max(o_ws)
    # zero-token doc restored with the sentinel row
    zero = next(r for r in out if r["doc_id"] == 60)
    assert (zero["n_feat"], zero["dsir_w"]) == (0, 0)


def test_dsir_count_rows_matches_windowed_features(spark):
    """The stream-legal in-row gram build (slice + zip_with) must be
    gram-for-gram identical to the batch posexplode+lead build:
    summing dsir_count_rows occurrences per dim over all docs equals
    summing dsir_features counts — including empty and 1-word docs
    (no bigrams), and raw = t0+t1 / target = t1 pivots."""
    rows = _dsir_corpus() + [(61, "single")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    flagged = df.withColumn("t", (F.col("doc_id") % 5 == 0).cast("long"))
    from servico_ocr_spark.operators.classify import dsir_count_rows

    cells = (
        dsir_count_rows(flagged, dims=64)
        .groupBy("dim", "t")
        .count()
        .collect()
    )
    rb_stream = {}
    tb_stream = {}
    for r in cells:
        rb_stream[r["dim"]] = rb_stream.get(r["dim"], 0) + r["count"]
        if r["t"] == 1:
            tb_stream[r["dim"]] = tb_stream.get(r["dim"], 0) + r["count"]
    feats = dsir_features(df, dims=64)
    rb_batch = {
        r["dim"]: r["s"]
        for r in feats.groupBy("dim").agg(F.sum("cnt").alias("s")).collect()
    }
    tgt = feats.join(
        df.where(F.col("doc_id") % 5 == 0).select("doc_id"), "doc_id"
    )
    tb_batch = {
        r["dim"]: r["s"]
        for r in tgt.groupBy("dim").agg(F.sum("cnt").alias("s")).collect()
    }
    assert rb_stream == rb_batch
    assert tb_stream == tb_batch


def test_dsir_partitioning_independence(spark):
    rows = _dsir_corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ref = sorted(
        map(tuple, dsir_weights(
            df, target_ids=df.where(F.col("doc_id") % 5 == 0)
            .select("doc_id"), dims=64).collect())
    )
    for n in (1, 13):
        rdf = df.repartition(n)
        got = sorted(
            map(tuple, dsir_weights(
                rdf, target_ids=rdf.where(F.col("doc_id") % 5 == 0)
                .select("doc_id"), dims=64).collect())
        )
        assert got == ref


def test_dsir_external_target_features_equivalent(spark):
    """target_ids (shared-pass subset) ≡ target_features built
    separately from the same docs — the external-corpus path."""
    rows = _dsir_corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    tgt_docs = df.where(F.col("doc_id") % 5 == 0)
    a = dsir_weights(
        df, target_ids=tgt_docs.select("doc_id"), dims=64
    ).collect()
    b = dsir_weights(
        df, target_features=dsir_features(tgt_docs, dims=64), dims=64
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    with pytest.raises(ValueError):
        dsir_weights(df, dims=64)
    with pytest.raises(ValueError):
        dsir_weights(
            df,
            target_ids=tgt_docs.select("doc_id"),
            target_features=dsir_features(tgt_docs, dims=64),
            dims=64,
        )
