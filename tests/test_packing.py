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
