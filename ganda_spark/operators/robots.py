"""robots.txt parsing + crawl-delay budgets (F8 north-rule generalization).

Parsing is a pure Catalyst fold — `aggregate()` over the file's lines with
a struct accumulator tracking whether we're inside a `User-agent: *`
section — so a 10^8-host robots corpus parses as a scan, no Python.

Honored subset (the politeness-relevant core): `User-agent: *` sections'
`Disallow:` prefixes and `Crawl-delay:` seconds. Non-star agent sections
are ignored (we crawl as *), empty Disallow means allow-all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROBOTS_SCHEMA = (
    "struct<in_star:boolean, disallow:array<string>, delay_ms:bigint>"
)

# directive value = text after the FIRST colon — substring_index(..., -1)
# (text after the LAST colon) mangles any value containing ':', e.g.
# 'Disallow: /redirect?to=http://x' would yield '//x' and under-block
_VAL = "trim(substr(raw, instr(raw, ':') + 1))"

_PARSE_FOLD = f"""
aggregate(
  split({{txt}}, '\\r?\\n'),
  named_struct('in_star', false,
               'disallow', CAST(array() AS ARRAY<STRING>),
               'delay_ms', CAST(0 AS BIGINT)),
  (acc, raw) -> CASE
    WHEN lower(trim(raw)) RLIKE '^user-agent\\\\s*:' THEN
      named_struct(
        'in_star', {_VAL} = '*',
        'disallow', acc.disallow,
        'delay_ms', acc.delay_ms)
    WHEN acc.in_star AND lower(trim(raw)) RLIKE '^disallow\\\\s*:'
         AND length({_VAL}) > 0 THEN
      named_struct(
        'in_star', acc.in_star,
        'disallow', array_append(acc.disallow, {_VAL}),
        'delay_ms', acc.delay_ms)
    WHEN acc.in_star AND lower(trim(raw)) RLIKE '^crawl-delay\\\\s*:' THEN
      named_struct(
        'in_star', acc.in_star,
        'disallow', acc.disallow,
        'delay_ms', CAST(try_cast({_VAL} AS DOUBLE)
                         * 1000 AS BIGINT))
    ELSE acc
  END,
  acc -> acc
)
"""


def sitemap_links(
    df: DataFrame, txt_col: str = "robots_txt", host_col: str = "host"
) -> DataFrame:
    """`Sitemap:` directive extraction from robots.txt — the discovery
    hop BEFORE extract_sitemap_urls: robots.txt names the sitemaps, the
    sitemaps name the URLs. Case-insensitive, whitespace-tolerant, NOT
    scoped to any User-agent section (per the robots.txt spec, Sitemap
    lines are global). One row per directive in file order; pure regexp
    projection."""
    links = F.regexp_extract_all(
        F.col(txt_col), F.lit(r"(?i)sitemap:\s*(\S+)"), 1
    )
    return df.select(
        F.col(host_col),
        F.posexplode(links).alias("sitemap_ordinal", "sitemap_url"),
    ).select(
        host_col,
        "sitemap_url",
        F.col("sitemap_ordinal").cast("long").alias("sitemap_ordinal"),
    )


def extract_sitemap_urls(
    df: DataFrame, xml_col: str = "sitemap_xml", host_col: str = "host"
) -> DataFrame:
    """Sitemap ingestion (the discovery channel robots.txt `Sitemap:`
    lines point at): pull every `<loc>` URL out of a sitemap XML document
    and explode to one row per URL, ordinal-stamped in document order.

    regexp_extract_all + posexplode — a projection per sitemap row, no
    shuffle, no XML library: sitemaps in the wild are too dirty for strict
    parsers anyway, and the `<loc>` scrape is what production crawlers do.
    Entity-decodes the XML-mandated `&amp;` in URLs.

    Adds: loc (string), loc_ordinal (long, 0-based document order)."""
    locs = F.regexp_extract_all(
        F.col(xml_col), F.lit(r"<loc>([^<]*)</loc>"), 1
    )
    out = df.select(
        F.col(host_col),
        F.posexplode(locs).alias("loc_ordinal", "loc"),
    )
    return out.select(
        host_col,
        F.regexp_replace(F.col("loc"), r"&amp;", "&").alias("loc"),
        F.col("loc_ordinal").cast("long").alias("loc_ordinal"),
    )


def parse_robots_txt(
    bodies: DataFrame, host_col: str = "host", txt_col: str = "robots_txt"
) -> DataFrame:
    """(host, robots_txt) → (host, disallow_prefixes, crawl_delay_ms)."""
    folded = F.expr(_PARSE_FOLD.format(txt=txt_col))
    return bodies.select(
        F.col(host_col).alias("host"),
        folded.getField("disallow").alias("disallow_prefixes"),
        F.coalesce(folded.getField("delay_ms"), F.lit(0)).alias("crawl_delay_ms"),
    )


def crawl_delay_budgets(
    robots: DataFrame, window_ms: int, default_budget: int
) -> DataFrame:
    """(host, budget): how many requests a generation window allows per
    host — floor(window / crawl_delay), capped by the default budget (the
    reference transport's 50-conns/host ceiling, requests/requests.go:29)."""
    return robots.select(
        "host",
        F.when(
            F.col("crawl_delay_ms") > 0,
            F.least(
                F.floor(window_ms / F.col("crawl_delay_ms")), F.lit(default_budget)
            ),
        )
        .otherwise(F.lit(default_budget))
        .cast("int")
        .alias("budget"),
    )
