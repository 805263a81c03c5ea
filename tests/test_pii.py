"""PII scrubbing operator (operators/pii.py)."""

from __future__ import annotations

from servico_ocr_spark.operators import scrub_pii


def _scrub_one(spark, text):
    row = scrub_pii(
        spark.createDataFrame([(1, text)], ["doc_id", "text"])
    ).collect()[0]
    return row


def test_scrub_email(spark):
    r = _scrub_one(spark, "mail First.Last+tag@sub.example.com now")
    assert r["scrubbed_text"] == "mail <EMAIL> now"
    assert (r["n_emails"], r["n_phones"], r["n_ipv4"]) == (1, 0, 0)


def test_scrub_phone_and_ip(spark):
    r = _scrub_one(spark, "call +55 1234-5678 from 10.0.255.3 ok")
    assert r["scrubbed_text"] == "call <PHONE> from <IP> ok"
    assert (r["n_emails"], r["n_phones"], r["n_ipv4"]) == (0, 1, 1)


def test_scrub_multiple_of_same_kind(spark):
    r = _scrub_one(spark, "a@b.co then c@d.org")
    assert r["scrubbed_text"] == "<EMAIL> then <EMAIL>"
    assert r["n_emails"] == 2


def test_scrub_boundaries(spark):
    # version-ish dotted number with a 4th group > 3 digits must NOT be
    # an ipv4 hit on its last-three-octets suffix (\b guards both ends);
    # a bare TLD-less @ string is not an email
    r = _scrub_one(spark, "v1.2.3.4567 and user@host")
    assert r["scrubbed_text"] == "v1.2.3.4567 and user@host"
    assert (r["n_emails"], r["n_phones"], r["n_ipv4"]) == (0, 0, 0)


def test_scrub_null_and_clean_text(spark):
    rows = scrub_pii(
        spark.createDataFrame(
            [(1, None), (2, "no pii here")], ["doc_id", "text"]
        )
    ).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[1]["scrubbed_text"] == ""
    assert by_id[1]["n_emails"] == 0
    assert by_id[2]["scrubbed_text"] == "no pii here"


def test_scrub_plan_is_pure_projection(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    plan = scrub_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan
