"""HTML→text extraction + per-host boilerplate removal (functions/html):
hand-crafted extraction cases, Spark↔DuckDB chain parity, threshold
boundaries, pass-through on no-boilerplate hosts, plan shape."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

from ganda_spark.functions.html import (
    HTML_STEPS,
    duck_html_text_sql,
    extract_html,
    remove_boilerplate,
)

MESSY = (
    '<html><head><title>T</title><style a="b">h1 {x:1}</style></head>'
    "<body><!-- note <b>bold</b> inside comment -->"
    '<script type="text/javascript">if (a<b && c>d) { f("</div>"); }</script>'
    "<h1>Head Line</h1><p>first &amp; second &lt;tag&gt; &quot;q&quot;</p>"
    "<ul><li> alpha </li><li>beta</li></ul>"
    "<table><TR><TD>c1</TD><td>c2&nbsp;x</td></TR></table>"
    '<a href="/l?a=1&b=2">anchor text</a> tail &apos;s&apos; &amp;amp; raw'
    "</body></html>"
)

MESSY_EXPECT = (
    "T\nHead Line\nfirst & second <tag> \"q\"\nalpha\nbeta\nc1\nc2 x\n"
    "anchor text tail 's' &amp; raw"
)


def _extract_one(spark, html):
    df = spark.createDataFrame([(1, html)], "id int, body string")
    return extract_html(df, "body", "text").head().text


def test_extraction_hand_crafted(spark):
    assert _extract_one(spark, MESSY) == MESSY_EXPECT


def test_extraction_edge_cases(spark):
    # no markup at all: text passes through (trimmed)
    assert _extract_one(spark, "  plain text  ") == "plain text"
    # NULL body → NULL text (a missing body is missing, not empty)
    df = spark.createDataFrame([(1, None)], "id int, body string")
    assert extract_html(df, "body").head().text is None
    # pure-chrome page extracts to empty
    assert _extract_one(spark, "<script>x()</script><style>y</style>") == ""
    # double-escaped entity decodes ONE level
    assert _extract_one(spark, "a &amp;lt; b") == "a &lt; b"
    # unclosed angle bracket survives (not a tag)
    assert _extract_one(spark, "1 < 2 always") == "1 < 2 always"


def test_duckdb_chain_parity(spark):
    """The oracle compiles the SAME HTML_STEPS table — byte parity on the
    nastiest case and on every template family the entry uses."""
    cases = [
        MESSY,
        "plain",
        "<BR><BR>a<BR>",
        "x &amp;amp; &amp;lt; y",
        "<div>a</div>\n\n<div>b</div>",
    ]
    con = duckdb.connect()
    dsql = duck_html_text_sql("h")
    for html in cases:
        got_duck = con.execute(
            f"SELECT {dsql} FROM (SELECT ? AS h)", [html]
        ).fetchone()[0]
        assert _extract_one(spark, html) == got_duck, html


def test_steps_table_shape():
    """The chain stays in the common Java∩RE2 dialect: no lookbehind, no
    backrefs, and `&amp;` decodes LAST among literal steps."""
    lits = [s for s in HTML_STEPS if s[0] == "lit"]
    assert lits[-1][1] == "&amp;"
    for kind, pat, _rep in HTML_STEPS:
        if kind == "re":
            assert "(?<" not in pat and "\\1" not in pat


def _bp_corpus(spark):
    rows = []
    for h, n in (("a", 4), ("b", 2)):
        for d in range(n):
            rows.append(
                (h, f"{h}{d}", f"NAV | {h}\nbody {h} {d}\nCopyright {h}")
            )
    return spark.createDataFrame(rows, "host string, doc_id string, text string")


def test_boilerplate_removed_only_on_qualifying_hosts(spark):
    out = {
        r.doc_id: r
        for r in remove_boilerplate(_bp_corpus(spark), min_docs=3).collect()
    }
    # host a (4 docs ≥ min_docs): nav+copyright removed, body kept
    assert out["a0"].text_clean == "body a 0"
    assert out["a3"].text_clean == "body a 3"
    assert out["a0"].n_boiler_removed == 2
    # host b (2 docs < min_docs): untouched
    assert out["b1"].text_clean == "NAV | b\nbody b 1\nCopyright b"
    assert out["b1"].n_boiler_removed == 0


def test_boilerplate_threshold_boundary(spark):
    """A line in exactly half the docs is boilerplate (≥, not >); one in
    fewer is kept."""
    rows = [
        ("h", "0", "half\nquarter\nu0"),
        ("h", "1", "half\nu1"),
        ("h", "2", "half\nu2"),
        ("h", "3", "half\nu3"),
        ("h", "4", "other\nu4"),
        ("h", "5", "other\nu5"),
        ("h", "6", "other\nu6"),
        ("h", "7", "other\nu7"),
    ]
    df = spark.createDataFrame(rows, "host string, doc_id string, text string")
    out = {r.doc_id: r.text_clean for r in remove_boilerplate(df).collect()}
    # 'half' and 'other' are each in 4/8 = exactly 50% → removed
    assert out["0"] == "quarter\nu0"  # 'quarter' in 1/8 → kept
    assert out["4"] == "u4"


def test_boilerplate_repeated_line_within_one_doc(spark):
    """array_distinct: a line repeated inside ONE doc counts that doc
    once — 10 copies in a single doc of a 4-doc host is 25% < 50%."""
    rows = [("h", "0", "\n".join(["spam"] * 10 + ["u0"]))] + [
        ("h", str(i), f"u{i}") for i in range(1, 4)
    ]
    df = spark.createDataFrame(rows, "host string, doc_id string, text string")
    out = {r.doc_id: r.text_clean for r in remove_boilerplate(df).collect()}
    assert out["0"].count("spam") == 10


def test_extraction_plan_is_projection(spark):
    """Extraction must stay a shuffle-free projection over the scan."""
    df = spark.range(10).withColumn("body", F.lit("<p>x</p>"))
    plan = extract_html(df, "body")._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "Exchange" not in final


def test_boilerplate_single_narrow_shuffle(spark):
    """The only exchanges carry (host, 32-char hash) rows and the
    aggregate sides; the document text column never shuffles — pinned by
    the broadcast joins on the doc side."""
    df = _bp_corpus(spark)
    plan = (
        remove_boilerplate(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    final = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final or "BroadcastNestedLoop" in final
