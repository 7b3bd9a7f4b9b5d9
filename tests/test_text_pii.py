"""PII detection + redaction (functions/pii): hand-crafted matches,
pattern disjointness (SSN vs phone), idempotence, JVM-only shuffle-free
plan."""

from ganda_spark.functions.pii import PII_PATTERNS, pii_metrics, redact_pii


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _run(spark, texts):
    out = redact_pii(pii_metrics(_docs(spark, texts)))
    return {row.doc_id: row for row in out.collect()}


def test_hand_crafted_counts_and_redaction(spark):
    r = _run(
        spark,
        [
            "write to alice.smith+tag@mail.example.org today",
            "ssn 078-05-1120 then call 415-555-0101 from 8.8.8.8",
            "plain words carry no secrets",
            "two mails a@b.io and c.d@e-corp.com plus 10.0.0.1",
        ],
    )
    assert (r[0].n_email, r[0].n_ssn, r[0].n_ipv4, r[0].n_phone) == (1, 0, 0, 0)
    assert r[0].redacted == "write to <EMAIL> today"
    assert (r[1].n_email, r[1].n_ssn, r[1].n_ipv4, r[1].n_phone) == (0, 1, 1, 1)
    assert r[1].redacted == "ssn <SSN> then call <PHONE> from <IP>"
    assert r[2].redacted == "plain words carry no secrets"
    assert (r[2].n_email, r[2].n_ssn, r[2].n_ipv4, r[2].n_phone) == (0, 0, 0, 0)
    assert r[3].n_email == 2 and r[3].n_ipv4 == 1
    assert r[3].redacted == "two mails <EMAIL> and <EMAIL> plus <IP>"


def test_ssn_phone_shapes_disjoint(spark):
    """3-2-4 is an SSN, 3-3-4 is a phone — neither pattern fires on the
    other's shape (the \\b anchors and fixed digit runs keep them apart)."""
    r = _run(spark, ["078-05-1120", "415-555-0101"])
    assert (r[0].n_ssn, r[0].n_phone) == (1, 0)
    assert (r[1].n_ssn, r[1].n_phone) == (0, 1)


def test_redaction_idempotent(spark):
    """Tokens contain no digits/@, so redacting a redacted text is a
    no-op — later patterns can never match into an earlier replacement."""
    first = redact_pii(_docs(spark, ["a@b.io 078-05-1120 1.2.3.4 415-555-0101"]))
    again = redact_pii(
        first.select("doc_id", first.redacted.alias("text"))
    ).collect()[0]
    assert again.text == again.redacted == "<EMAIL> <SSN> <IP> <PHONE>"
    for _, token in PII_PATTERNS.values():
        assert token in again.redacted


def test_jvm_only_shuffle_free_plan(spark):
    out = redact_pii(pii_metrics(_docs(spark, ["x"])))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan
