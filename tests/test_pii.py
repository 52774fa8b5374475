"""PII scrub: cross-engine exactness, pass-order semantics, idempotence."""

import re

import duckdb
import pandas as pd

from o2g_spark.functions import pii

DOCS = pd.DataFrame(
    {
        "doc_id": range(9),
        "text": [
            "reach alice.smith+work@example.co.uk or bob@sub.domain.org now",
            "server at 192.168.0.1 and 8.8.8.8, not 999.1.1.1",
            "call (555) 123-4567 or +1 555-987-6543 x22 or 555.321.7654",
            "mixed: eve@10.0.0.1.nip.io from 10.0.0.2 phone 555-321-7654",
            "no pii here, just ids 1234567890 and version 1.2.3",
            "",
            "edges a@b.co 0.0.0.0 255.255.255.255 256.1.1.1 1.2.3.4.5",
            "not-an-email @example.com weird@@double foo@bar",
            "Contact: carol@example.com, 172.16.254.3, (800) 555-0199.",
        ],
    }
)


def _run_duck():
    con = duckdb.connect()
    con.register("docs", DOCS)
    sql = pii.scrub_pii_sql("SELECT * FROM docs", "doc_id", "text")
    out = con.execute(f"SELECT * FROM ({sql}) ORDER BY doc_id").fetchdf()
    con.close()
    return out


def _run_spark(spark):
    df = spark.createDataFrame(DOCS)
    return (
        pii.scrub_pii(df, "doc_id", "text").orderBy("doc_id").toPandas()
    )


def test_cross_engine_exact(spark):
    s = _run_spark(spark)
    d = _run_duck()
    assert list(s.columns) == list(d.columns)
    for col in s.columns:
        assert list(s[col]) == list(d[col]), col


def test_semantics(spark):
    s = _run_spark(spark).set_index("doc_id")
    # row 0: two emails, no IP/phone
    assert s.loc[0, "n_email"] == 2 and s.loc[0, "n_ipv4"] == 0
    assert pii.EMAIL_MASK in s.loc[0, "text"]
    assert "alice" not in s.loc[0, "text"]
    # row 1: strict octets — 999.1.1.1 survives, two real IPs masked
    assert s.loc[1, "n_ipv4"] == 2
    assert "999.1.1.1" in s.loc[1, "text"]
    assert "192.168.0.1" not in s.loc[1, "text"]
    # row 2: three phone formats, zero IPs (dotted phone not eaten by IP)
    assert s.loc[2, "n_phone"] == 3 and s.loc[2, "n_ipv4"] == 0
    # row 3: email-with-IP-host masked as EMAIL (order), bare IP as IP
    assert s.loc[3, "n_email"] == 1 and s.loc[3, "n_ipv4"] == 1
    assert "10.0.0.1" not in s.loc[3, "text"]
    assert s.loc[3, "n_phone"] == 1
    # row 4: bare 10-digit run is NOT a phone (documented precision bias)
    assert s.loc[4, "n_phone"] == 0 and s.loc[4, "n_email"] == 0
    assert s.loc[4, "n_ipv4"] == 0  # 1.2.3 is not an IP
    # row 6: boundary octets ok; 256.x rejected; 1.2.3.4 eaten from .5 run
    assert s.loc[6, "n_ipv4"] == 3
    assert "256.1.1.1" in s.loc[6, "text"]


def test_counts_equal_masks_inserted(spark):
    s = _run_spark(spark)
    for _, row in s.iterrows():
        for kind, _, mask in pii.PII_KINDS:
            n_masks = row["text"].count(mask)
            assert n_masks == row[f"n_{kind}"], (row["doc_id"], kind)


def test_idempotent(spark):
    df = spark.createDataFrame(DOCS)
    once = pii.scrub_pii(df, "doc_id", "text")
    twice = pii.scrub_pii(once.select("doc_id", "text"), "doc_id", "text")
    rows = twice.orderBy("doc_id").collect()
    assert all(r.n_email == 0 and r.n_ipv4 == 0 and r.n_phone == 0 for r in rows)
    t1 = [r.text for r in once.orderBy("doc_id").collect()]
    t2 = [r.text for r in rows]
    assert t1 == t2


def test_report_drops_text(spark):
    df = spark.createDataFrame(DOCS)
    rep = pii.pii_report(df, "doc_id", "text")
    assert rep.columns == ["doc_id", "n_email", "n_ipv4", "n_phone"]


def test_python_reference_counts(spark):
    """Counts match a plain-Python re-implementation of the pass chain."""
    s = _run_spark(spark).set_index("doc_id")
    for _, r in DOCS.iterrows():
        cur = r["text"]
        for kind, pattern, mask in pii.PII_KINDS:
            exp = len(re.findall(pattern, cur))
            assert exp == s.loc[r["doc_id"], f"n_{kind}"], (r["doc_id"], kind)
            cur = re.sub(pattern, mask, cur)
        assert cur == s.loc[r["doc_id"], "text"]
