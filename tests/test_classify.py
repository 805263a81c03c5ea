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
