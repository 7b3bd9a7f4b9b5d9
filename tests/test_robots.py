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
