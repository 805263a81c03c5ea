"""URL canonicalization / url-dedup / domain-stats operator tests.

The canonical form is a documented spec (operators/urls module
docstring); these tests pin it with explicit expected strings, then
check the aggregate operators and the physical-plan shape (projection
must stay shuffle-free; each aggregate exactly one exchange)."""

import pytest
from pyspark.sql import functions as F

from servico_ocr_spark.operators import (
    canonicalize_urls,
    domain_cap,
    domain_stats,
    latest_crawl,
    url_dedup,
)

CASES = [
    # (raw, canonical, host, registered_domain)
    (
        "HTTP://WWW.Example.COM:80/Path/X?b=2&utm_source=x&a=1#frag",
        "http://www.example.com/Path/X?a=1&b=2",
        "www.example.com",
        "example.com",
    ),
    ("https://Example.com:443", "https://example.com/", "example.com",
     "example.com"),
    # non-default port is identity-relevant and kept (also in the domain's
    # host grouping key, but not in registered_domain)
    ("https://example.com:8080/x", "https://example.com:8080/x",
     "example.com:8080", "example.com"),
    # all params dropped -> no dangling '?'
    ("http://example.com/?utm_source=a&fbclid=b&gclid=c&msclkid=d&ref=e",
     "http://example.com/", "example.com", "example.com"),
    # param order never matters; '' params (from '&&') dropped
    ("http://example.com/p?z=1&&a=2", "http://example.com/p?a=2&z=1",
     "example.com", "example.com"),
    # :443 is only default for https (kept on http), :80 only for http
    ("http://example.com:443/x", "http://example.com:443/x",
     "example.com:443", "example.com"),
    # deep subdomain -> last two labels
    ("https://a.b.c.example.org/q", "https://a.b.c.example.org/q",
     "a.b.c.example.org", "example.org"),
    # path case preserved, host case folded
    ("http://EXAMPLE.net/CaseSensitive", "http://example.net/CaseSensitive",
     "example.net", "example.net"),
    # no scheme:// prefix -> opaque passthrough, empty host/domain
    ("urn:doc:42", "urn:doc:42", "", ""),
    # 'ref' is tracking, but 'refresh'/'referrer_id' are not ('ref=' exact)
    ("http://x.com/?ref=spam&refresh=1", "http://x.com/?refresh=1",
     "x.com", "x.com"),
]


def test_canonical_spec(spark):
    df = spark.createDataFrame(
        [(i, c[0]) for i, c in enumerate(CASES)], ["doc_id", "url"]
    )
    got = {
        r["doc_id"]: (r["canonical_url"], r["host"], r["registered_domain"])
        for r in canonicalize_urls(df).collect()
    }
    for i, (_, canon, host, dom) in enumerate(CASES):
        assert got[i] == (canon, host, dom), f"case {i}: {CASES[i][0]}"


def test_url_dedup_collapses_identity_families(spark):
    fam = [
        (0, "http://a.com/x?utm_source=1"),
        (1, "HTTP://A.COM:80/x#frag"),
        (2, "http://a.com/x"),
        (3, "https://a.com/x"),  # different scheme -> different identity
        (4, "http://a.com/y"),
    ]
    out = {
        r["canonical_url"]: (r["keep_id"], r["n_dups"])
        for r in url_dedup(spark.createDataFrame(fam, ["doc_id", "url"])).collect()
    }
    assert out == {
        "http://a.com/x": (0, 3),
        "https://a.com/x": (3, 1),
        "http://a.com/y": (4, 1),
    }


def test_domain_stats_counts_and_dup_ppm(spark):
    rows = [
        (0, "http://www.a.com/x"),
        (1, "http://a.com/x"),       # same domain, different host
        (2, "http://A.COM/x#f"),     # canonical-dup of 1
        (3, "https://b.org/only"),
    ]
    out = {
        r["registered_domain"]: r.asDict()
        for r in domain_stats(
            spark.createDataFrame(rows, ["doc_id", "url"])
        ).collect()
    }
    a = out["a.com"]
    assert (a["n_docs"], a["n_hosts"], a["n_canonical"]) == (3, 2, 2)
    assert a["dup_ppm"] == 333333  # floor((3-2)*1e6/3)
    b = out["b.org"]
    assert (b["n_docs"], b["n_hosts"], b["n_canonical"], b["dup_ppm"]) == (
        1, 1, 1, 0)


def test_plan_shapes(spark):
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("http://s"), (F.col("id") % 5).cast("string"),
                 F.lit(".com/p"), (F.col("id") % 7).cast("string")).alias("url"),
    )

    def plan(d):
        return d._jdf.queryExecution().executedPlan().toString()

    # canonicalize is a pure projection: no exchange at all
    assert "Exchange" not in plan(canonicalize_urls(df))
    # the aggregates shuffle exactly once, with a map-side partial agg
    p_dedup = plan(url_dedup(df))
    assert p_dedup.count("Exchange hashpartitioning") == 1
    assert "partial_min" in p_dedup or "partial" in p_dedup.lower()
    # domain_stats uses two count(DISTINCT) -> Spark plans the expand
    # strategy; still a single logical rollup (no join, no window)
    p_dom = plan(domain_stats(df))
    assert "Join" not in p_dom and "Window" not in p_dom


def _cap_input(spark):
    # 60 docs over 3 domains with skewed sizes (40/15/5)
    rows = (
        [(i, f"http://big.com/p{i}") for i in range(40)]
        + [(i, f"http://mid.org/p{i}") for i in range(40, 55)]
        + [(i, f"http://tiny.net/p{i}") for i in range(55, 60)]
    )
    return spark.createDataFrame(rows, ["doc_id", "url"])


def test_domain_cap_keeps_k_smallest_ids(spark):
    out = domain_cap(_cap_input(spark), k=4).select(
        "registered_domain", "doc_id"
    ).collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r["registered_domain"], []).append(r["doc_id"])
    assert sorted(by_dom["big.com"]) == [0, 1, 2, 3]
    assert sorted(by_dom["mid.org"]) == [40, 41, 42, 43]
    assert sorted(by_dom["tiny.net"]) == [55, 56, 57, 58]


def test_domain_cap_two_stage_equals_one_stage(spark):
    df = _cap_input(spark)
    one = sorted(
        (r["doc_id"] for r in domain_cap(df, k=7).collect())
    )
    for buckets in (2, 4, 16):
        two = sorted(
            r["doc_id"]
            for r in domain_cap(df, k=7, salt_buckets=buckets).collect()
        )
        assert two == one, f"salt_buckets={buckets}"


def test_latest_crawl_freshest_wins_ties_to_smallest_id(spark):
    import datetime as dt

    t = lambda h: dt.datetime(2024, 3, 1, h)  # noqa: E731
    rows = [
        # same canonical url (fragment/tracking noise), different ts
        (1, "http://a.com/x?utm_source=s", t(5)),
        (2, "http://a.com/x#frag", t(9)),
        (3, "http://a.com/x", t(7)),
        # tie on ts -> smallest doc_id kept
        (10, "https://b.org/", t(3)),
        (11, "https://b.org/#s", t(3)),
        # singleton
        (20, "http://c.net/only", t(1)),
    ]
    out = {
        r["canonical_url"]: r
        for r in latest_crawl(
            spark.createDataFrame(rows, ["doc_id", "url", "warc_ts"])
        ).collect()
    }
    a = out["http://a.com/x"]
    assert (a["keep_id"], a["n_crawls"]) == (2, 3)
    assert a["last_crawl_ts"] == t(9)
    b = out["https://b.org/"]
    assert (b["keep_id"], b["n_crawls"]) == (10, 2)
    c = out["http://c.net/only"]
    assert (c["keep_id"], c["n_crawls"]) == (20, 1)


def test_latest_crawl_plan_is_one_aggregate(spark):
    import datetime as dt

    df = spark.createDataFrame(
        [(1, "http://a.com/", dt.datetime(2024, 1, 1))],
        ["doc_id", "url", "warc_ts"],
    )
    plan = latest_crawl(df)._jdf.queryExecution().executedPlan().toString()
    # max_by resolves the representative inside the partial aggregate:
    # no window, no join, map-side combine present
    assert "Window" not in plan and "Join" not in plan
    assert "partial_max_by" in plan or "partial_max" in plan


def test_driver_fixture_pairs_are_duplicates(spark):
    """Every {2k, 2k+1} pair in the driver's url fixture must collapse to
    one canonical url (noise differs, identity does not) — except the
    doc_id % 101 == 100 opaque-urn docs, which stand alone."""
    import __spark_entry__ as entrymod

    corpus = entrymod._url_corpus(spark, "/root/testdata/sf0.001")
    c = canonicalize_urls(corpus).select(
        "doc_id", "canonical_url",
        F.expr("doc_id div 2").alias("d2"),
    )
    pairs = (
        c.where(F.col("doc_id") % 101 != 100)
        .groupBy("d2")
        .agg(F.count_distinct("canonical_url").alias("n"),
             F.count("*").alias("members"))
    )
    bad = pairs.where((F.col("members") == 2) & (F.col("n") != 1)).count()
    assert bad == 0
    # and the fixture is not degenerate: urn docs exist at sf0.001? (60
    # docs -> doc_ids 0..59 -> none hit % 101 == 100; assert the fixture
    # still produces >1 distinct canonical per site family overall)
    assert c.select("canonical_url").distinct().count() > 10


def test_crawl_delta_statuses_and_representatives(spark):
    from servico_ocr_spark.operators import crawl_delta

    old = spark.createDataFrame(
        [
            # canonical family in both crawls, same content -> unchanged
            (1, "http://a.com/x?utm_source=s", "same"),
            (2, "http://a.com/x#frag", "noise"),  # not the representative
            # in both, content drifts -> changed
            (3, "http://b.org/", "v1"),
            # only in old -> removed
            (4, "http://gone.net/", "bye"),
        ],
        ["doc_id", "url", "content"],
    )
    new = spark.createDataFrame(
        [
            # representative is min doc_id per side: old rep=1, new rep=5
            (5, "http://a.com/x", "same"),
            (6, "http://b.org/#s", "v2"),
            # only in new -> added
            (7, "http://fresh.io/", "hi"),
        ],
        ["doc_id", "url", "content"],
    )
    out = {
        r["canonical_url"]: r for r in crawl_delta(old, new).collect()
    }
    assert len(out) == 4
    a = out["http://a.com/x"]
    assert (a["status"], a["old_id"], a["new_id"]) == ("unchanged", 1, 5)
    b = out["http://b.org/"]
    assert (b["status"], b["old_id"], b["new_id"]) == ("changed", 3, 6)
    assert out["http://gone.net/"]["status"] == "removed"
    assert out["http://gone.net/"]["new_id"] == -1
    assert out["http://fresh.io/"]["status"] == "added"
    assert out["http://fresh.io/"]["old_id"] == -1


def test_crawl_delta_plan_no_window_aggs_before_join(spark):
    from servico_ocr_spark.operators import crawl_delta

    df = spark.createDataFrame(
        [(1, "http://a.com/", "c")], ["doc_id", "url", "content"]
    )
    plan = (
        crawl_delta(df, df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one map-side-combinable agg per side, one equi join on the
    # canonical url string, no windows
    assert "Window" not in plan
    assert plan.count("FullOuter") == 1 or "full_outer" in plan.lower()
    assert "partial_min_by" in plan or "partial_min" in plan


def test_crawl_schedule_contract_and_two_stage_equality(spark):
    from servico_ocr_spark.operators import crawl_schedule

    rows = (
        [(i, f"http://big.com/p{i}") for i in range(40)]
        + [(100 + i, f"http://small.org/{i}") for i in range(3)]
        + [(900, "urn:doc:900")]  # no host: not schedulable
    )
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    a = sorted(
        (r["host"], r["doc_id"], r["slot"], r["wave"])
        for r in crawl_schedule(df, rate_per_wave=4).collect()
    )
    b = sorted(
        (r["host"], r["doc_id"], r["slot"], r["wave"])
        for r in crawl_schedule(df, rate_per_wave=4, two_stage=False)
        .collect()
    )
    assert a == b  # bucket-offset enumeration is EXACT
    assert len(a) == 43  # urn row dropped
    per_host = {}
    for h, _, slot, wave in a:
        per_host.setdefault(h, []).append((slot, wave))
    # slots tile 0..n-1 per host; wave = slot div rate
    for h, sw in per_host.items():
        slots = sorted(s for s, _ in sw)
        assert slots == list(range(len(sw)))
        assert all(w == s // 4 for s, w in sw)
    assert len(per_host["big.com"]) == 40
    assert len(per_host["small.org"]) == 3


def test_crawl_schedule_deterministic_across_partitionings(spark):
    from servico_ocr_spark.operators import crawl_schedule

    rows = [(i, f"http://h{i % 5}.net/x{i}") for i in range(60)]
    base = None
    for parts in (1, 7):
        df = spark.createDataFrame(rows, ["doc_id", "url"]).repartition(
            parts
        )
        got = sorted(
            (r["host"], r["doc_id"], r["slot"], r["wave"])
            for r in crawl_schedule(df, rate_per_wave=2).collect()
        )
        if base is None:
            base = got
        else:
            assert got == base


def test_crawl_schedule_validates_params(spark):
    import pytest

    from servico_ocr_spark.operators import crawl_schedule

    df = spark.createDataFrame([(1, "http://a.com/")], ["doc_id", "url"])
    with pytest.raises(ValueError):
        crawl_schedule(df, rate_per_wave=0)
    with pytest.raises(ValueError):
        crawl_schedule(df, buckets=3)


def test_robots_disallow_prefix_semantics(spark):
    from servico_ocr_spark.operators import robots_disallow

    pages = spark.createDataFrame(
        [
            (1, "https://a.com/private/x"),
            (2, "https://a.com/privateer"),   # prefix match: blocked
            (3, "https://a.com/pub/x"),
            (4, "https://b.org/private/x"),   # no rule for b.org
            (5, "https://a.com/private/x?q=1#f"),  # canonical: blocked
            (6, "urn:doc:6"),                 # no host: never blocked
            (7, "https://a.com/tmp/y"),       # second rule host
        ],
        "doc_id long, url string",
    )
    rules = spark.createDataFrame(
        [("a.com", "/private"), ("a.com", "/tmp")],
        "host string, prefix string",
    )
    got = {r["doc_id"]: (r["blocked"], r["n_rules_matched"])
           for r in robots_disallow(pages, rules).collect()}
    assert got == {1: (1, 1), 2: (1, 1), 3: (0, 0), 4: (0, 0),
                   5: (1, 1), 6: (0, 0), 7: (1, 1)}


def test_robots_disallow_broadcasts_rules(spark):
    from servico_ocr_spark.operators import robots_disallow

    pages = spark.createDataFrame(
        [(1, "https://a.com/x")], "doc_id long, url string")
    rules = spark.createDataFrame(
        [("a.com", "/x")], "host string, prefix string")
    df = robots_disallow(pages, rules)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_scd2_intervals_islands_and_open_interval(spark):
    from datetime import datetime

    from servico_ocr_spark.operators import scd2_intervals

    rows = [
        # url A: v1 v1 v2 v1 — note v1 RETURNS (a new island, not a
        # merge with the first one: SCD2 is consecutive-run semantics)
        ("A", datetime(2024, 1, 1), "v1"),
        ("A", datetime(2024, 1, 2), "v1"),
        ("A", datetime(2024, 1, 3), "v2"),
        ("A", datetime(2024, 1, 4), "v1"),
        # url B: never changes
        ("B", datetime(2024, 1, 1), "x"),
        ("B", datetime(2024, 1, 9), "x"),
    ]
    df = spark.createDataFrame(rows, "url string, ts timestamp, content string")
    out = sorted(
        scd2_intervals(df.repartition(5)).collect(),
        key=lambda r: (r["url"], r["valid_from"]),
    )
    a = [r for r in out if r["url"] == "A"]
    assert [(r["content"], r["n_snaps"]) for r in a] == [
        ("v1", 2), ("v2", 1), ("v1", 1)
    ]
    assert a[0]["valid_to"] == a[1]["valid_from"] == datetime(2024, 1, 3)
    assert a[1]["valid_to"] == datetime(2024, 1, 4)
    assert a[2]["valid_to"] is None  # open interval
    b = [r for r in out if r["url"] == "B"]
    assert len(b) == 1 and b[0]["n_snaps"] == 2 and b[0]["valid_to"] is None


def test_path_prefix_rollup_semantics(spark):
    from servico_ocr_spark.operators import path_prefix_rollup

    rows = [
        ("h1", "https://h1/a/b/c"),    # 3 segs: folds into /a and /a/b
        ("h1", "https://h1/a/b"),      # 2 segs
        ("h1", "https://h1/a/b"),      # duplicate url: n_pages 2, n_urls 1
        ("h1", "https://h1/a/x"),
        ("h1", "https://h1/"),         # root: no row
        ("h2", "urn:doc:7"),           # pathless: no row
        ("h2", "https://h2/solo"),
    ]
    df = spark.createDataFrame(rows, "host string, canonical_url string")
    out = {(r["host"], r["prefix"], r["depth"]): (r["n_pages"], r["n_urls"])
           for r in path_prefix_rollup(df, max_depth=2).collect()}
    assert out == {
        ("h1", "/a", 1): (4, 3),
        ("h1", "/a/b", 2): (3, 2),
        ("h1", "/a/x", 2): (1, 1),
        ("h2", "/solo", 1): (1, 1),
    }
    # depth cap binds: /a/b/c never appears as its own prefix
    assert not any(p == "/a/b/c" for (_, p, _) in out)
    # partitioning independence
    out13 = {(r["host"], r["prefix"], r["depth"]): (r["n_pages"], r["n_urls"])
             for r in path_prefix_rollup(
                 df.repartition(13), max_depth=2).collect()}
    assert out13 == out


def test_apportion_budget_hamilton_exact(spark):
    from servico_ocr_spark.operators import apportion_budget

    m = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 2), ("z", 0)],
        "host string, n_pages long",
    )
    # budget 7 over masses 5:3:2 (total 10): floors 3,2,1 (sum 6),
    # remainders 5,1,4 -> the 1 leftover slot goes to 'a' (rem 5)
    out = {r["group"]: r for r in apportion_budget(m, 7).collect()}
    assert set(out) == {"a", "b", "c"}  # zero-mass group excluded
    assert [out[g]["floor_q"] for g in "abc"] == [3, 2, 1]
    assert [out[g]["quota"] for g in "abc"] == [4, 2, 1]
    assert sum(r["quota"] for r in out.values()) == 7

    # tie remainders break by group ascending: masses 1,1,1 budget 4 ->
    # floors 1,1,1, remainders all equal -> extra to 'a'
    m2 = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 1)], "host string, n_pages long"
    )
    out2 = {r["group"]: r["quota"] for r in apportion_budget(m2, 4).collect()}
    assert out2 == {"a": 2, "b": 1, "c": 1}

    # exactness property on a bigger random-ish table
    m3 = spark.createDataFrame(
        [(f"h{i}", 1 + (i * 37) % 101) for i in range(50)],
        "host string, n_pages long",
    )
    for budget in (0, 1, 97, 1000):
        rows = apportion_budget(m3, budget).collect()
        assert sum(r["quota"] for r in rows) == budget
        assert all(r["quota"] - r["floor_q"] in (0, 1) for r in rows)

    # partitioning independence
    a = sorted((r["group"], r["quota"])
               for r in apportion_budget(m3, 97).collect())
    b = sorted((r["group"], r["quota"])
               for r in apportion_budget(m3.repartition(13), 97).collect())
    assert a == b


def test_freshness_scores_stepwise_decay(spark):
    from servico_ocr_spark.operators import freshness_scores

    # corpus max date = 2024-03-29 ("now"); ages 0, 6, 7, 14, 700 days
    rows = [
        ("h1", "2024-03-29 10:00:00"),   # age 0  -> 2^20
        ("h1", "2024-03-23 01:00:00"),   # age 6  -> 2^20 (same half-life)
        ("h1", "2024-03-22 23:00:00"),   # age 7  -> 2^19
        ("h2", "2024-03-15 00:00:00"),   # age 14 -> 2^18
        ("h2", "2022-04-29 00:00:00"),   # age 700 -> 2^20 >> 100 = 0
    ]
    df = spark.createDataFrame(rows, "host string, ts string").select(
        "host", F.col("ts").cast("timestamp").alias("warc_ts")
    )
    out = {r["group"]: r for r in freshness_scores(
        df, half_life_days=7).collect()}
    assert out["h1"]["score"] == (1 << 20) + (1 << 20) + (1 << 19)
    assert out["h1"]["freshest_age_days"] == 0
    assert out["h2"]["score"] == (1 << 18) + 0
    assert out["h2"]["n_pages"] == 2
    # partitioning independence
    again = {r["group"]: r["score"] for r in freshness_scores(
        df.repartition(7), half_life_days=7).collect()}
    assert again == {g: r["score"] for g, r in out.items()}
