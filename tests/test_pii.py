"""PII detection/redaction semantics on a doctored corpus (the gate
corpus contains no PII by construction, so parity there is trivial —
these tests prove the patterns and redaction actually work)."""

import pytest

from demo_cdc_users_airline_spark.operators.text import text_pii_redact

DOCS = [
    # 0: email + phone in one doc
    (0, "Contact John.Doe+spam@Mail-Example.ORG or call 415-555-1234 now"),
    # 1: two IPs, one phone-like digit run without separators
    (1, "server 192.168.1.255 proxies 10.0.0.1 ticket 4155551234"),
    # 2: near-misses that must NOT fire: truncated ip, short digit run,
    #    @ without a domain tld
    (2, "v1.2.3 build 12345 ping user@localhost done"),
    # 3: clean prose — byte-identical after redaction (modulo lowercase)
    (3, "plain lorem ipsum text with no identifiers at all"),
]


@pytest.fixture(scope="module")
def pii(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("piicorpus")
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in DOCS],
        "doc_id long, text string, lang string, source string, n_chars long")
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return {r["doc_id"]: r for r in text_pii_redact(spark, str(d)).collect()}


def test_email_and_phone_detected_and_redacted(pii):
    r = pii[0]
    assert (r["n_emails"], r["n_phones"], r["n_ips"]) == (1, 1, 0)
    assert r["has_pii"] and r["n_pii"] == 2
    assert r["redacted_text"] == "contact <EMAIL> or call <PHONE> now"


def test_ips_and_bare_digit_phone(pii):
    r = pii[1]
    assert (r["n_emails"], r["n_phones"], r["n_ips"]) == (0, 1, 2)
    assert r["redacted_text"] == "server <IP> proxies <IP> ticket <PHONE>"


def test_near_misses_do_not_fire(pii):
    r = pii[2]
    assert not r["has_pii"]
    assert r["n_pii"] == 0
    # user@localhost: no dot-tld, must not match the email pattern
    assert "<EMAIL>" not in r["redacted_text"]


def test_clean_doc_untouched(pii):
    r = pii[3]
    assert not r["has_pii"]
    assert r["redacted_text"] == DOCS[3][1]  # already lowercase


def test_gate_corpus_is_clean(spark):
    # the synthetic corpus has no digits or @ — the operator must agree
    out = text_pii_redact(spark, "/root/testdata/sf0.001")
    assert out.filter("has_pii").count() == 0
