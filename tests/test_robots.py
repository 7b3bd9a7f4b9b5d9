"""robots.txt parsing fold + crawl-delay budgets."""

from __future__ import annotations


from ganda_spark.config import EngineConfig
from ganda_spark.operators.politeness import pop_batch
from ganda_spark.operators.robots import crawl_delay_budgets, parse_robots_txt
from ganda_spark.sources.frontier import seed_frontier

ROBOTS_A = """User-agent: googlebot
Disallow: /only-google

User-agent: *
Disallow: /private
Disallow: /tmp/
Crawl-delay: 2
"""

ROBOTS_B = """User-agent: *
Disallow:
"""

ROBOTS_C = "User-agent: *\r\nDisallow: /a\r\nCrawl-delay: 0.5\r\n"


def _parse(spark, pairs):
    df = spark.createDataFrame(pairs, "host string, robots_txt string")
    return {r["host"]: r for r in parse_robots_txt(df).collect()}


def test_parse_star_section_only(spark):
    out = _parse(spark, [("a.test", ROBOTS_A)])["a.test"]
    # googlebot-only rules ignored; star section honored
    assert out["disallow_prefixes"] == ["/private", "/tmp/"]
    assert out["crawl_delay_ms"] == 2000


def test_empty_disallow_allows_all(spark):
    out = _parse(spark, [("b.test", ROBOTS_B)])["b.test"]
    assert out["disallow_prefixes"] == []
    assert out["crawl_delay_ms"] == 0


def test_crlf_and_fractional_delay(spark):
    out = _parse(spark, [("c.test", ROBOTS_C)])["c.test"]
    assert out["disallow_prefixes"] == ["/a"]
    assert out["crawl_delay_ms"] == 500


def test_disallow_value_with_colon(spark):
    # Regression (ADVICE r1): values split on the LAST colon mangled any
    # path containing ':' — '/redirect?to=http://x' became '//x' and
    # disallowed URLs passed the gate. Split on the FIRST colon.
    txt = (
        "User-agent: *\n"
        "Disallow: /redirect?to=http://x\n"
        "Disallow: /a:b\n"
    )
    out = _parse(spark, [("d.test", txt)])["d.test"]
    assert out["disallow_prefixes"] == ["/redirect?to=http://x", "/a:b"]


def test_crawl_delay_budget_caps_pop(spark, sf_dir):
    frontier = seed_frontier(spark, sf_dir)
    robots = spark.createDataFrame(
        [("host-0.test", ["/x"], 250), ("host-1.test", ["/x"], 0)],
        "host string, disallow_prefixes array<string>, crawl_delay_ms int",
    )
    budgets = crawl_delay_budgets(robots, window_ms=1000, default_budget=50)
    got = {r["host"]: r["budget"] for r in budgets.collect()}
    assert got == {"host-0.test": 4, "host-1.test": 50}  # 1000/250, default

    cfg = EngineConfig(per_host_budget=50)
    released, deferred = pop_batch(frontier, cfg, host_budgets=budgets)
    per_host = {r["host"]: r["count"] for r in released.groupBy("host").count().collect()}
    totals = {r["host"]: r["count"] for r in frontier.groupBy("host").count().collect()}
    assert per_host["host-0.test"] == 4                              # crawl-delay cap
    assert per_host["host-1.test"] == min(50, totals["host-1.test"])  # default budget
    assert per_host["host-2.test"] == min(50, totals["host-2.test"])  # no robots row
    assert released.count() + deferred.count() == frontier.count()


# -- sitemap <loc> extraction ------------------------------------------------


def test_sitemap_extract_locs_in_order(spark):
    from ganda_spark.operators.robots import extract_sitemap_urls

    xml = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc>http://h.test/a</loc><lastmod>2026-01-01</lastmod></url>"
        "<url><loc>http://h.test/b?x=1&amp;y=2</loc></url>"
        "<url><loc>http://h.test/c</loc></url>"
        "</urlset>"
    )
    df = spark.createDataFrame(
        [("h.test", xml)], "host string, sitemap_xml string"
    )
    rows = extract_sitemap_urls(df).orderBy("loc_ordinal").collect()
    assert [r.loc for r in rows] == [
        "http://h.test/a",
        "http://h.test/b?x=1&y=2",  # &amp; entity-decoded
        "http://h.test/c",
    ]
    assert [r.loc_ordinal for r in rows] == [0, 1, 2]
    assert all(r.host == "h.test" for r in rows)


def test_sitemap_extract_dirty_and_empty(spark):
    from ganda_spark.operators.robots import extract_sitemap_urls

    df = spark.createDataFrame(
        [
            ("a.test", "no loc tags here at all"),
            ("b.test", "<loc>http://b.test/only</loc> trailing garbage <loc"),
        ],
        "host string, sitemap_xml string",
    )
    rows = extract_sitemap_urls(df).collect()
    # empty sitemap yields zero rows, not a null row
    assert {r.host for r in rows} == {"b.test"}
    assert rows[0].loc == "http://b.test/only"


def test_sitemap_extract_plan_is_projection(spark):
    from ganda_spark.operators.robots import extract_sitemap_urls

    df = spark.createDataFrame(
        [("h", "<loc>u</loc>")], "host string, sitemap_xml string"
    )
    out = extract_sitemap_urls(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sitemap_links_directives(spark):
    """Sitemap: lines are global (not UA-scoped), case-insensitive,
    whitespace-tolerant; ordinals follow file order."""
    from ganda_spark.operators.robots import sitemap_links

    txt = (
        "User-agent: *\nDisallow: /private\n"
        "Sitemap: http://h.test/a.xml\n"
        "User-agent: badbot\nDisallow: /\n"
        "SITEMAP:http://h.test/b.xml\n"
        "sitemap:\thttp://h.test/c.xml\n"
    )
    df = spark.createDataFrame([("h.test", txt)], "host string, robots_txt string")
    rows = sitemap_links(df).orderBy("sitemap_ordinal").collect()
    assert [r.sitemap_url for r in rows] == [
        "http://h.test/a.xml",
        "http://h.test/b.xml",   # found even inside a non-star section
        "http://h.test/c.xml",
    ]
    assert [r.sitemap_ordinal for r in rows] == [0, 1, 2]
    # a robots file with no sitemap lines yields zero rows
    none = spark.createDataFrame(
        [("x.test", "User-agent: *\nDisallow: /")],
        "host string, robots_txt string",
    )
    assert sitemap_links(none).count() == 0


# ---------------------------------------------------------------------------
# RFC 9309 parser + gate (r6)
# ---------------------------------------------------------------------------

from ganda_spark.operators.robots import parse_robots_rfc, rfc_robots_gate


def _gate(spark, robots_pairs, url_pairs, agent="ganda-spark"):
    rdf = spark.createDataFrame(robots_pairs, "host string, robots_txt string")
    parsed = parse_robots_rfc(rdf, agent=agent)
    fr = spark.createDataFrame(url_pairs, "host string, url string")
    allowed, blocked = rfc_robots_gate(fr, parsed)
    return (
        {r.url for r in allowed.collect()},
        {r.url for r in blocked.collect()},
    )


def test_rfc_overblock_allow_escape(spark):
    """The VERDICT-pinned over-block case: Disallow: / + Allow: /public
    must allow /public/* and block the rest (longest match wins)."""
    robots = "User-agent: *\nDisallow: /\nAllow: /public\n"
    allowed, blocked = _gate(
        spark,
        [("h", robots)],
        [
            ("h", "http://h/public/doc"),
            ("h", "http://h/publicity"),  # prefix match, no path-segment rule
            ("h", "http://h/"),
            ("h", "http://h/private"),
        ],
    )
    assert allowed == {"http://h/public/doc", "http://h/publicity"}
    assert blocked == {"http://h/", "http://h/private"}


def test_rfc_tie_breaks_to_allow(spark):
    """Equal-length Allow and Disallow patterns: least-restrictive wins."""
    robots = "User-agent: *\nDisallow: /page\nAllow: /page\n"
    allowed, blocked = _gate(spark, [("h", robots)], [("h", "http://h/page")])
    assert allowed == {"http://h/page"}
    assert blocked == set()


def test_rfc_wildcards_and_anchor(spark):
    robots = "User-agent: *\nDisallow: /*.php$\nDisallow: /fish*bar\n"
    allowed, blocked = _gate(
        spark,
        [("h", robots)],
        [
            ("h", "http://h/x.php"),          # anchored match
            ("h", "http://h/x.php?q=1"),      # query defeats the $ anchor
            ("h", "http://h/x.phpx"),         # anchored: no match
            ("h", "http://h/fishyfoobar"),    # * spans arbitrary text
            ("h", "http://h/plain"),
        ],
    )
    assert blocked == {"http://h/x.php", "http://h/fishyfoobar"}
    assert allowed == {"http://h/x.php?q=1", "http://h/x.phpx", "http://h/plain"}


def test_rfc_specific_agent_wins_over_star(spark):
    """Exact product-token group is chosen; the * group is then ignored
    entirely (no rule mixing across groups)."""
    robots = (
        "User-agent: googlebot\nUser-agent: ganda-spark\n"
        "Disallow: /private*\nAllow: /private/pub$\nCrawl-delay: 1.5\n\n"
        "User-agent: *\nDisallow: /\n"
    )
    allowed, blocked = _gate(
        spark,
        [("h", robots)],
        [
            ("h", "http://h/private/pub"),
            ("h", "http://h/private/pubx"),
            ("h", "http://h/open"),  # * would block; chosen group allows
        ],
    )
    assert allowed == {"http://h/private/pub", "http://h/open"}
    assert blocked == {"http://h/private/pubx"}
    # crawl-delay comes from the CHOSEN group
    rdf = spark.createDataFrame([("h", robots)], "host string, robots_txt string")
    row = parse_robots_rfc(rdf).collect()[0]
    assert row.crawl_delay_ms == 1500


def test_rfc_case_insensitive_token_and_merged_groups(spark):
    """UA match is case-insensitive; two groups with the same token merge."""
    robots = (
        "User-agent: GANDA-SPARK\nDisallow: /a\n\n"
        "user-agent: Ganda-Spark\nDisallow: /b\n"
    )
    allowed, blocked = _gate(
        spark,
        [("h", robots)],
        [("h", "http://h/a1"), ("h", "http://h/b2"), ("h", "http://h/c")],
    )
    assert blocked == {"http://h/a1", "http://h/b2"}
    assert allowed == {"http://h/c"}


def test_rfc_no_robots_and_no_match_allow(spark):
    robots = "User-agent: *\nDisallow: /x\n"
    allowed, blocked = _gate(
        spark,
        [("h", robots)],
        [("h", "http://h/y"), ("nobots", "http://nobots/anything")],
    )
    assert allowed == {"http://h/y", "http://nobots/anything"}
    assert blocked == set()


def test_rfc_comments_and_empty_rules_ignored(spark):
    robots = (
        "# top comment\nUser-agent: * # trailing\n"
        "Disallow: /secret # why not\nAllow:\nDisallow:\n"
    )
    allowed, blocked = _gate(
        spark, [("h", robots)], [("h", "http://h/secret/x"), ("h", "http://h/ok")]
    )
    assert blocked == {"http://h/secret/x"}
    assert allowed == {"http://h/ok"}


def test_rfc_consecutive_ua_lines_share_rules(spark):
    """RFC 9309: blank lines do NOT end a group — consecutive User-agent
    lines (even blank-separated) form one group sharing the rules."""
    robots = "User-agent: ganda-spark\n\nUser-agent: *\nDisallow: /\n"
    allowed, blocked = _gate(spark, [("h", robots)], [("h", "http://h/any")])
    assert blocked == {"http://h/any"}
    # but a group CLOSED by a rule line, left rules-less for our token,
    # means allow-all: empty Disallow closes the header run
    robots2 = "User-agent: ganda-spark\nDisallow:\n\nUser-agent: *\nDisallow: /\n"
    allowed2, blocked2 = _gate(spark, [("h", robots2)], [("h", "http://h/any")])
    assert allowed2 == {"http://h/any"}


def test_rfc_metachar_patterns_stay_literal(spark):
    """Regex metacharacters in patterns are escaped — '.' must not match
    any-char, '+' and parens stay literal."""
    robots = "User-agent: *\nDisallow: /a.b\nDisallow: /c+(d)\n"
    allowed, blocked = _gate(
        spark,
        [("h", robots)],
        [("h", "http://h/a.b/x"), ("h", "http://h/aXb"), ("h", "http://h/c+(d)e")],
    )
    assert blocked == {"http://h/a.b/x", "http://h/c+(d)e"}
    assert allowed == {"http://h/aXb"}
