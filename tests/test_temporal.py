"""Semantic unit tests for operators/temporal.asof_join (the DuckDB
native-ASOF-JOIN parity lives in the driver contract: asof_attribution
in test_entry_contract / driver_sim)."""

from datetime import datetime

import pytest

from servico_ocr_spark.operators import asof_join


def _ts(day, hour=0):
    return datetime(2024, 1, day, hour)


def _frames(spark):
    build = spark.createDataFrame(
        [
            (1, _ts(1), 10, "a"),
            (1, _ts(3), 30, "b"),
            (2, _ts(2), 20, "c"),
        ],
        "k long, ts timestamp, vid long, tag string",
    )
    probe = spark.createDataFrame(
        [
            (100, 1, _ts(2)),   # between build rows -> day-1 match
            (101, 1, _ts(3)),   # equal ts -> inclusive vs strict differ
            (102, 1, _ts(9)),   # after all -> day-3 match
            (103, 2, _ts(1)),   # before any -> null
            (104, 3, _ts(5)),   # key absent from build -> null
        ],
        "pid long, k long, ts timestamp",
    )
    return probe, build


def _run(spark, **kw):
    probe, build = _frames(spark)
    out = asof_join(
        probe, build, on="k", probe_ts="ts", build_ts="ts",
        value_cols=["vid", "tag"], **kw,
    )
    return {r["pid"]: (r["asof_vid"], r["asof_tag"]) for r in out.collect()}


def test_asof_backward_inclusive(spark):
    got = _run(spark)
    assert got == {
        100: (10, "a"),
        101: (30, "b"),   # equal ts matches when inclusive
        102: (30, "b"),
        103: (None, None),
        104: (None, None),
    }


def test_asof_strictly_before(spark):
    got = _run(spark, inclusive=False)
    assert got[101] == (10, "a")  # equal-ts build row excluded
    # everything else is unaffected by the tie rule
    assert got[100] == (10, "a") and got[102] == (30, "b")
    assert got[103] == (None, None) and got[104] == (None, None)


def test_asof_tie_break_picks_max(spark):
    build = spark.createDataFrame(
        [(1, _ts(1), 10), (1, _ts(1), 11), (1, _ts(1), 9)],
        "k long, ts timestamp, vid long",
    )
    probe = spark.createDataFrame(
        [(100, 1, _ts(2))], "pid long, k long, ts timestamp"
    )
    out = asof_join(
        probe, build, on="k", probe_ts="ts", build_ts="ts",
        value_cols=["vid"], tie_break="vid",
    ).collect()
    assert out[0]["asof_vid"] == 11


def test_asof_null_probe_ts_and_null_build_rows(spark):
    build = spark.createDataFrame(
        [(1, _ts(1), 10), (1, None, 99), (None, _ts(1), 98)],
        "k long, ts timestamp, vid long",
    )
    probe = spark.createDataFrame(
        [(100, 1, _ts(2)), (101, 1, None)],
        "pid long, k long, ts timestamp",
    )
    got = {
        r["pid"]: r["asof_vid"]
        for r in asof_join(
            probe, build, on="k", probe_ts="ts", build_ts="ts",
            value_cols=["vid"],
        ).collect()
    }
    # null-ts/key build rows are dropped, never matched; a null probe ts
    # sorts before every build row and matches nothing
    assert got == {100: 10, 101: None}


def test_asof_partitioning_independence(spark):
    probe, build = _frames(spark)
    ref = _run(spark)
    for n in (1, 7):
        out = asof_join(
            probe.repartition(n), build.repartition(max(1, 8 - n)),
            on="k", probe_ts="ts", build_ts="ts", value_cols=["vid", "tag"],
        )
        got = {r["pid"]: (r["asof_vid"], r["asof_tag"]) for r in out.collect()}
        assert got == ref


def test_asof_reserved_and_empty_value_cols_raise(spark):
    probe, build = _frames(spark)
    with pytest.raises(ValueError):
        asof_join(
            probe.withColumnRenamed("pid", "_tag"), build,
            on="k", probe_ts="ts", build_ts="ts", value_cols=["vid"],
        )
    with pytest.raises(ValueError):
        asof_join(
            probe, build, on="k", probe_ts="ts", build_ts="ts",
            value_cols=[],
        )


def test_asof_plan_has_no_join(spark):
    """The whole point of the union-and-window shape: the physical plan
    contains a Window and NO join operator of any kind."""
    probe, build = _frames(spark)
    plan = (
        asof_join(
            probe, build, on="k", probe_ts="ts", build_ts="ts",
            value_cols=["vid"],
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" in plan
    assert "Join" not in plan and "CartesianProduct" not in plan


def _broadcast_run(spark, **kw):
    probe, build = _frames(spark)
    from servico_ocr_spark.operators import asof_join_broadcast

    out = asof_join_broadcast(
        probe, build, on="k", probe_ts="ts", build_ts="ts",
        value_cols=["vid", "tag"], **kw,
    )
    return {r["pid"]: (r["asof_vid"], r["asof_tag"]) for r in out.collect()}


def test_asof_broadcast_matches_shuffle_variant(spark):
    assert _broadcast_run(spark) == _run(spark)
    assert _broadcast_run(spark, inclusive=False) == _run(
        spark, inclusive=False
    )


def test_asof_broadcast_plan_is_broadcast_no_shuffle_on_probe(spark):
    """One build-side agg + one BroadcastHashJoin; the probe side must
    reach the join without any Exchange hashpartitioning."""
    import re

    from servico_ocr_spark.operators import asof_join_broadcast

    probe, build = _frames(spark)
    df = asof_join_broadcast(
        probe, build, on="k", probe_ts="ts", build_ts="ts",
        value_cols=["vid"],
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final, final[:3000]
    # the only hash exchange allowed is the build-side groupBy
    n = len(re.findall(r"\bExchange hashpartitioning", final))
    assert n <= 1, final[:3000]
