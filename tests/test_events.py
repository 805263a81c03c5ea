"""Unit tests for operators/events: ordered funnels + cohort retention
(known-value fixtures, a pure-Python differential, strict-ordering edge
cases, and partitioning independence)."""

from datetime import datetime, timedelta

from servico_ocr_spark.operators import cohort_retention, funnel_counts

T0 = datetime(2024, 1, 1, 12, 0, 0)


def _ev(user, minutes, et):
    return (user, T0 + timedelta(minutes=minutes), et)


EV_SCHEMA = "user_id long, ts timestamp, event_type string"


def test_funnel_known_values_and_strict_ordering(spark):
    rows = [
        # u1 completes in order
        _ev(1, 0, "view"), _ev(1, 5, "click"), _ev(1, 9, "purchase"),
        # u2 clicks BEFORE its first view -> stalls at step 1
        _ev(2, 3, "click"), _ev(2, 4, "view"),
        # u3 click at the EXACT view timestamp -> strict >, stalls
        _ev(3, 7, "view"), _ev(3, 7, "click"),
        # u4 never views (click+purchase only) -> never enters
        _ev(4, 1, "click"), _ev(4, 2, "purchase"),
        # u5 view->click, purchase earlier than the click -> step 2
        _ev(5, 0, "purchase"), _ev(5, 1, "view"), _ev(5, 2, "click"),
        # noise event types are ignored
        _ev(1, 1, "error"), _ev(2, 1, "signup"),
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    got = {
        r["step"]: (r["step_name"], r["n_users"])
        for r in funnel_counts(
            df, ["view", "click", "purchase"]
        ).collect()
    }
    assert got == {
        1: ("view", 4),      # u1 u2 u3 u5
        2: ("click", 2),     # u1 u5
        3: ("purchase", 1),  # u1
    }


def test_funnel_unreached_step_emits_zero_row(spark):
    rows = [_ev(1, 0, "view"), _ev(2, 1, "view")]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    got = sorted(
        (r["step"], r["step_name"], r["n_users"])
        for r in funnel_counts(df, ["view", "click"]).collect()
    )
    assert got == [(1, "view", 2), (2, "click", 0)]


def _funnel_reference(rows, steps):
    """Plain-python first-touch strictly-ordered funnel."""
    by_user = {}
    for u, ts, et in rows:
        by_user.setdefault(u, []).append((ts, et))
    counts = [0] * len(steps)
    for evs in by_user.values():
        prev = None
        for i, s in enumerate(steps):
            ts_list = [
                t for t, et in evs
                if et == s and (prev is None or t > prev)
            ]
            if not ts_list:
                break
            prev = min(ts_list)
            counts[i] += 1
    return {i + 1: c for i, c in enumerate(counts)}


def test_funnel_matches_python_reference(spark):
    types = ["view", "click", "purchase", "error"]
    rows = [
        _ev(u, (u * 13 + k * 7) % 97, types[(u * 3 + k * 5) % 4])
        for u in range(25)
        for k in range(8)
    ]
    steps = ["view", "click", "purchase"]
    want = _funnel_reference(rows, steps)
    for parts in (1, 7):
        df = spark.createDataFrame(rows, EV_SCHEMA).repartition(parts)
        got = {
            r["step"]: r["n_users"]
            for r in funnel_counts(df, steps).collect()
        }
        assert got == want, parts


def test_cohort_retention_known_values(spark):
    def day(user, d, minutes=0):
        return (
            user,
            datetime(2024, 1, 1 + d, 8, 0, 0) + timedelta(minutes=minutes),
            "view",
        )

    rows = [
        # cohort 01-01: u1 active d0,d1,d3; u2 active d0 only
        day(1, 0), day(1, 0, 30), day(1, 1), day(1, 3),
        day(2, 0),
        # cohort 01-02: u3 active d0,d2 (relative)
        day(3, 1), day(3, 3),
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    got = {
        (r["cohort_day"], r["offset_days"]): r["n_users"]
        for r in cohort_retention(df).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 3): 1,
        ("2024-01-02", 0): 1,
        ("2024-01-02", 2): 1,
    }


def test_cohort_retention_partitioning_independence(spark):
    rows = [
        (u, datetime(2024, 1, 1 + (u * 5 + k * 3) % 9, k, 0, 0), "view")
        for u in range(20)
        for k in range(6)
    ]
    base = None
    for parts in (1, 5):
        df = spark.createDataFrame(rows, EV_SCHEMA).repartition(parts)
        got = sorted(
            (r["cohort_day"], r["offset_days"], r["n_users"])
            for r in cohort_retention(df).collect()
        )
        if base is None:
            base = got
        else:
            assert got == base


# ---------------------------------------------------------------------------
# event transitions (Markov flow counts)
# ---------------------------------------------------------------------------

EV_ID_SCHEMA = "event_id long, user_id long, ts timestamp, event_type string"


def test_event_transitions_known_values_and_tie_break(spark):
    from servico_ocr_spark.operators import event_transitions

    rows = [
        # u1: view -> click -> purchase (last event: no successor)
        (1, 1, T0, "view"),
        (2, 1, T0 + timedelta(minutes=1), "click"),
        (3, 1, T0 + timedelta(minutes=2), "purchase"),
        # u2: simultaneous pair ordered by event_id: view(10) -> click(11)
        (11, 2, T0, "click"),
        (10, 2, T0, "view"),
        # u3: single event contributes nothing
        (20, 3, T0, "error"),
        # u4: view -> view (self transition counts)
        (30, 4, T0, "view"),
        (31, 4, T0 + timedelta(minutes=5), "view"),
    ]
    df = spark.createDataFrame(rows, EV_ID_SCHEMA)
    got = {(r["event_type"], r["next_type"]): r["n_transitions"]
           for r in event_transitions(df).collect()}
    assert got == {
        ("view", "click"): 2,
        ("click", "purchase"): 1,
        ("view", "view"): 1,
    }
    # terminal mass is recoverable: rows - sum(outgoing) = one terminal
    # event per user
    assert len(rows) - sum(got.values()) == 4


def test_event_transitions_partitioning_independence(spark):
    from servico_ocr_spark.operators import event_transitions

    rows = [
        (i, i % 5, T0 + timedelta(minutes=(i * 7) % 13),
         ("view", "click", "purchase", "error")[(i * 3) % 4])
        for i in range(80)
    ]
    base = None
    for parts in (1, 7):
        df = spark.createDataFrame(rows, EV_ID_SCHEMA).repartition(parts)
        got = sorted(
            (r["event_type"], r["next_type"], r["n_transitions"])
            for r in event_transitions(df).collect()
        )
        if base is None:
            base = got
        else:
            assert got == base


def test_activity_gapfill_known_values(spark):
    from servico_ocr_spark.operators import activity_gapfill

    rows = [
        # u1: Jan 1 (x2), Jan 4 -> gap days Jan 2, Jan 3 zero-filled
        (1, datetime(2024, 1, 1, 8), "a"),
        (1, datetime(2024, 1, 1, 9), "b"),
        (1, datetime(2024, 1, 4, 10), "a"),
        # u2: a single event -> exactly one row, no expansion
        (2, datetime(2024, 2, 10, 23, 59), "a"),
        # u3: two adjacent days -> no gap rows
        (3, datetime(2024, 3, 1, 0), "a"),
        (3, datetime(2024, 3, 2, 0), "a"),
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    got = sorted(
        (r["user_id"], r["day"], r["n_events"])
        for r in activity_gapfill(df).collect()
    )
    assert got == [
        (1, "2024-01-01", 2), (1, "2024-01-02", 0),
        (1, "2024-01-03", 0), (1, "2024-01-04", 1),
        (2, "2024-02-10", 1),
        (3, "2024-03-01", 1), (3, "2024-03-02", 1),
    ]


def test_activity_gapfill_partitioning_independence(spark):
    from servico_ocr_spark.operators import activity_gapfill

    rows = [
        (u, T0 + timedelta(hours=(u * 37 + j * 13) % 2000), "a")
        for u in range(8)
        for j in range((u % 5) + 1)
    ]
    base = None
    for parts in (1, 5):
        df = spark.createDataFrame(rows, EV_SCHEMA).repartition(parts)
        got = sorted(
            (r["user_id"], r["day"], r["n_events"])
            for r in activity_gapfill(df).collect()
        )
        if base is None:
            base = got
        else:
            assert got == base
    # span tiling: per user, rows cover first..last day contiguously
    from collections import defaultdict
    per_user = defaultdict(list)
    for u, d, n in base:
        per_user[u].append((d, n))
    from datetime import date
    for u, pairs in per_user.items():
        days = [date.fromisoformat(d) for d, _ in pairs]
        assert days == sorted(days)
        assert (days[-1] - days[0]).days + 1 == len(days)
        assert pairs[0][1] > 0 and pairs[-1][1] > 0  # endpoints active


# ---------------------------------------------------------------------------
# daily-rate anomaly flags (integer Poisson z-test)
# ---------------------------------------------------------------------------

def _py_rate_anomalies(rows, z=3):
    """rows: (key, 'yyyy-mm-dd'). Independent mirror of rate_anomalies:
    zero-filled span, dev = n*nd - s, anomalous iff dev^2 > z^2*s*nd."""
    from collections import Counter
    from datetime import date, timedelta

    daily = Counter(rows)
    keys = {k for k, _ in rows}
    out = {}
    for k in keys:
        days = sorted(d for kk, d in daily if kk == k)
        d0 = date.fromisoformat(days[0])
        d1 = date.fromisoformat(days[-1])
        nd = (d1 - d0).days + 1
        s = sum(n for (kk, _), n in daily.items() if kk == k)
        for i in range(nd):
            d = (d0 + timedelta(days=i)).isoformat()
            n = daily.get((k, d), 0)
            dev = n * nd - s
            if dev * dev > z * z * s * nd:
                status = "spike" if dev > 0 else "drop"
            else:
                status = "normal"
            out[(k, d)] = (n, s, nd, status)
    return out


def test_rate_anomalies_matches_python_reference(spark):
    from servico_ocr_spark.operators import rate_anomalies

    # key 'a': steady 10/day over 9 days, except a 40-event day-3 spike
    # and a zero day-6 (absent from input -> must be zero-FILLED and
    # flagged); key 'b': a 2-day key (short span edge)
    rows = []
    for i in range(1, 10):
        if i == 6:
            continue
        n = 40 if i == 3 else 10
        rows += [("a", f"2024-02-0{i}")] * n
    rows += [("b", "2024-02-01")] * 5 + [("b", "2024-02-03")] * 5
    from pyspark.sql import functions as F

    ev = spark.createDataFrame(
        [(k, f"{d} 12:00:00") for k, d in rows],
        "event_type string, ts string",
    ).select("event_type", F.col("ts").cast("timestamp").alias("ts"))
    got = {(r["key"], r["day"]):
           (r["n_events"], r["base_total"], r["base_days"], r["status"])
           for r in rate_anomalies(ev, z=3).collect()}
    want = _py_rate_anomalies(rows, z=3)
    assert got == want
    # the three branches are all live, incl. the zero-filled drop day
    assert got[("a", "2024-02-03")][3] == "spike"
    assert got[("a", "2024-02-06")] == (0, 110, 9, "drop")
    assert got[("a", "2024-02-01")][3] == "normal"
    # b's missing middle day exists as a zero-filled row
    assert ("b", "2024-02-02") in got


def test_rolling_daily_counts_range_frame_bridges_gaps(spark):
    from datetime import datetime

    from servico_ocr_spark.operators import rolling_daily_counts

    rows = [
        # key "a": days 1, 2, then a 6-day gap to day 9
        (1, datetime(2024, 1, 1, 10), "a"),
        (2, datetime(2024, 1, 1, 11), "a"),
        (3, datetime(2024, 1, 2, 10), "a"),
        (4, datetime(2024, 1, 9, 10), "a"),
        # key "b": single day
        (5, datetime(2024, 1, 5, 10), "b"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    )
    out = {
        (r["key"], r["day"]): (r["n_day"], r["n_roll"])
        for r in rolling_daily_counts(df, window_days=7).collect()
    }
    assert out[("a", "2024-01-01")] == (2, 2)
    assert out[("a", "2024-01-02")] == (1, 3)
    # day 9 is 7 days after day 2: a ROWS frame would read 4 here;
    # the RANGE frame correctly sees only day 9 itself (days 3-8 empty)
    assert out[("a", "2024-01-09")] == (1, 1)
    assert out[("b", "2024-01-05")] == (1, 1)
    assert len(out) == 4


def test_event_path_ngrams_windows_and_bounds(spark):
    import datetime as dt

    from servico_ocr_spark.operators import event_path_ngrams

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # user 1: a b a b  -> trigrams (a,b,a), (b,a,b)
        (1, t(0), "a", 10), (1, t(1), "b", 11),
        (1, t(2), "a", 12), (1, t(3), "b", 13),
        # user 2: only two events -> no trigram
        (2, t(0), "a", 20), (2, t(1), "b", 21),
        # user 3: tie timestamps -> id order decides: c a b
        (3, t(5), "c", 30), (3, t(5), "a", 31), (3, t(5), "b", 32),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )
    out = {(r["step1"], r["step2"], r["step3"]): r["n_paths"]
           for r in event_path_ngrams(df, n=3).collect()}
    assert out == {("a", "b", "a"): 1, ("b", "a", "b"): 1,
                   ("c", "a", "b"): 1}
    # n=2 degenerates to event_transitions counts
    out2 = {(r["step1"], r["step2"]): r["n_paths"]
            for r in event_path_ngrams(df, n=2).collect()}
    assert out2[("a", "b")] == 4  # 2 from user 1, 1 each from users 2, 3
    # partitioning independence
    again = {(r["step1"], r["step2"], r["step3"]): r["n_paths"]
             for r in event_path_ngrams(df.repartition(7), n=3).collect()}
    assert again == out
