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


# ---------------------------------------------------------------------------
# RFC 9309 parser + gate (VERDICT r5 missing #2): Allow:, */$ wildcards,
# longest-match precedence, group selection by product token
# ---------------------------------------------------------------------------

# line preprocessing per RFC: strip '#' comments, trim; directive value =
# text after the FIRST colon (the '/redirect?to=http://x' lesson above)
_LINE = "trim(substring_index(raw, '#', 1))"
_LVAL = f"trim(substr({_LINE}, instr({_LINE}, ':') + 1))"
_LLOW = f"lower({_LINE})"

# Catalyst fold with full group structure: consecutive User-agent lines
# form ONE group (rules attach to every listed token); a rule line closes
# the header run; rules/delays outside any group are ignored; empty rule
# values are ignored (empty Disallow = allow-all). `seen` records every
# token so a group with ZERO rules still wins selection (a crawler whose
# token has an empty group is allowed everything, even if `*` disallows).
_PARSE_RFC_FOLD = f"""
aggregate(
  split({{txt}}, '\\r?\\n'),
  named_struct(
    'agents', CAST(array() AS ARRAY<STRING>),
    'seen', CAST(array() AS ARRAY<STRING>),
    'in_rules', false,
    'rules', CAST(array() AS ARRAY<STRUCT<agent:STRING, allow:BOOLEAN, pattern:STRING>>),
    'delays', CAST(array() AS ARRAY<STRUCT<agent:STRING, delay_ms:BIGINT>>)),
  (acc, raw) -> CASE
    WHEN {_LLOW} RLIKE '^user-agent\\\\s*:' THEN named_struct(
      'agents', CASE WHEN acc.in_rules THEN array(lower({_LVAL}))
                     ELSE array_append(acc.agents, lower({_LVAL})) END,
      'seen', array_append(acc.seen, lower({_LVAL})),
      'in_rules', false,
      'rules', acc.rules,
      'delays', acc.delays)
    WHEN {_LLOW} RLIKE '^(dis)?allow\\\\s*:' THEN named_struct(
      'agents', acc.agents,
      'seen', acc.seen,
      'in_rules', true,
      'rules', CASE WHEN size(acc.agents) > 0 AND length({_LVAL}) > 0 THEN
          concat(acc.rules, transform(acc.agents, a -> named_struct(
            'agent', a,
            'allow', {_LLOW} RLIKE '^allow',
            'pattern', {_LVAL})))
        ELSE acc.rules END,
      'delays', acc.delays)
    WHEN {_LLOW} RLIKE '^crawl-delay\\\\s*:' THEN named_struct(
      'agents', acc.agents,
      'seen', acc.seen,
      'in_rules', true,
      'rules', acc.rules,
      'delays', CASE WHEN size(acc.agents) > 0
                      AND try_cast({_LVAL} AS DOUBLE) IS NOT NULL THEN
          concat(acc.delays, transform(acc.agents, a -> named_struct(
            'agent', a,
            'delay_ms', CAST(try_cast({_LVAL} AS DOUBLE) * 1000 AS BIGINT))))
        ELSE acc.delays END)
    ELSE acc
  END,
  acc -> acc
)
"""


def _rule_struct(r: F.Column) -> F.Column:
    """(agent, allow, pattern) → (allow, pattern, segs, anchored): the
    robots path pattern pre-split on `*` into literal segments, plus the
    trailing-`$` anchor flag (only a TRAILING `$` anchors; mid-pattern `$`
    is literal — the de-facto semantics).

    Segments, not a compiled regex: a regex whose pattern is a COLUMN
    recompiles per row per rule; matching over literal segments is a fold
    of `locate` calls (plain string scans, no compilation) with identical
    semantics for `*`-only patterns. Measured (r6 rehearsal, 150k URLs ×
    4 rules, 32 cores): the segment gate costs the same as the PLAIN
    PREFIX gate (4.48 s vs 4.56 s for both output sides) — wildcard
    support is free at match time."""
    p = r["pattern"]
    ends = p.endswith("$")
    core = F.when(ends, F.substr(p, F.lit(1), F.length(p) - 1)).otherwise(p)
    return F.struct(
        r["allow"].alias("allow"),
        p.alias("pattern"),
        F.split(core, r"\*", -1).alias("segs"),
        ends.alias("anchored"),
    )


def _rule_matches(path: F.Column, r: F.Column) -> F.Column:
    """Does rule `r` (segs + anchored) match `path`? Greedy leftmost
    segment placement — correct for `*`-only wildcard patterns: the first
    segment must be a prefix, later segments are found with locate() at or
    after the cursor, and an anchored pattern additionally requires its
    LAST segment to be a suffix starting at/after the cursor (exact match
    when the pattern has no `*` at all)."""
    segs = r["segs"]
    k = F.size(segs)
    base = F.when(r["anchored"], F.slice(segs, 1, k - 1)).otherwise(segs)
    # acc: (pos, first) — pos<0 = failed; aggregate over an empty base
    # (anchored single-segment pattern) leaves the init (1, true)
    pos = F.aggregate(
        base,
        F.struct(
            F.lit(1).cast("long").alias("pos"), F.lit(True).alias("first")
        ),
        lambda acc, s: F.when(acc["pos"] < 0, acc)
        .when(
            s == "",
            F.struct(acc["pos"].alias("pos"), F.lit(False).alias("first")),
        )
        .when(
            acc["first"],
            F.when(
                F.substr(path, F.lit(1), F.length(s)) == s,
                F.struct(
                    (F.length(s) + 1).cast("long").alias("pos"),
                    F.lit(False).alias("first"),
                ),
            ).otherwise(
                F.struct(
                    F.lit(-1).cast("long").alias("pos"),
                    F.lit(False).alias("first"),
                )
            ),
        )
        .otherwise(
            F.when(
                F.call_function("locate", s, path, acc["pos"]) > 0,
                F.struct(
                    (F.call_function("locate", s, path, acc["pos"]) + F.length(s))
                    .cast("long")
                    .alias("pos"),
                    F.lit(False).alias("first"),
                ),
            ).otherwise(
                F.struct(
                    F.lit(-1).cast("long").alias("pos"),
                    F.lit(False).alias("first"),
                )
            )
        ),
    )["pos"]
    last = F.element_at(segs, -1)
    spos = F.length(path) - F.length(last) + 1
    anchored_ok = (
        (F.length(path) >= F.length(last))
        & (F.substr(path, spos, F.length(last)) == last)
        & (spos >= pos)
        & ((k > 1) | (spos == 1))
    )
    return F.when(pos < 0, F.lit(False)).otherwise(
        F.when(r["anchored"], anchored_ok).otherwise(F.lit(True))
    )


def parse_robots_rfc(
    bodies: DataFrame,
    agent: str = "ganda-spark",
    host_col: str = "host",
    txt_col: str = "robots_txt",
) -> DataFrame:
    """RFC 9309 parse + group selection for one crawler product token.

    (host, robots_txt) → (host, rfc_rules: array<struct<allow, pattern,
    rx>>, crawl_delay_ms). Group selection per §2.2.1: case-insensitive
    EXACT product-token match wins over the `*` group; multiple groups
    with the same token merge; a token whose group has no rules at all
    means allow-all for that crawler. Note consecutive User-agent lines
    (blank/comment lines between them included — blank lines do NOT end a
    group in RFC 9309) form ONE group sharing the following rules.
    Crawl-delay (non-RFC but universal) is the LAST value in the chosen
    group's sections.

    Pure Catalyst throughout: one aggregate() fold per robots file plus
    array transforms — a 10^8-host robots corpus parses as a scan.

    Callers that gate REPEATEDLY against the same rules (every crawl
    generation) should persist — or localize, for a small host set — this
    output: the parse fold otherwise re-enters every downstream action's
    plan (measured ~1.5 s of re-compilation per materialization on the r6
    rehearsal; localizing removed it entirely)."""
    agent_l = agent.strip().lower()
    folded = F.expr(_PARSE_RFC_FOLD.format(txt=txt_col))
    out = bodies.withColumn("_rb", folded).withColumn(
        "_chosen",
        F.when(
            F.array_contains(F.col("_rb")["seen"], F.lit(agent_l)),
            F.lit(agent_l),
        ).otherwise(F.lit("*")),
    )
    rules = F.transform(
        F.filter(
            F.col("_rb")["rules"], lambda r: r["agent"] == F.col("_chosen")
        ),
        _rule_struct,
    )
    delays = F.filter(
        F.col("_rb")["delays"], lambda d: d["agent"] == F.col("_chosen")
    )
    delay_ms = F.coalesce(
        F.try_element_at(delays, F.lit(-1))["delay_ms"], F.lit(0)
    )
    return out.select(
        F.col(host_col).alias("host"),
        rules.alias("rfc_rules"),
        delay_ms.cast("long").alias("crawl_delay_ms"),
    )


def rfc_robots_tag(
    frontier: DataFrame, robots: DataFrame, blocked_col: str = "_blocked"
) -> DataFrame:
    """ONE-PASS RFC 9309 verdicts: frontier plus a boolean `blocked_col`.
    Callers that need BOTH sides of the split should consume this frame
    directly — `rfc_robots_gate` filters it twice, which re-runs the
    (expensive) per-URL rule-match fold once per side when the result is
    reassembled by union (guide §2.4; measured 2× on the f8_rfc entry).

    Matching: among the rules whose pattern matches the URL path, the
    LONGEST pattern wins; on a length tie Allow beats Disallow (§2.2.2
    least-restrictive rule); no matching rule — or no robots row for the
    host — means allowed. The rules table is host-sized and broadcast;
    the per-URL decision is a filter + array_max over the (small) rules
    array, no shuffle, no UDF."""
    r = F.broadcast(robots.select("host", "rfc_rules"))
    joined = frontier.join(r, "host", "left")
    raw_path = F.parse_url(F.col("url"), F.lit("PATH"))
    query = F.parse_url(F.col("url"), F.lit("QUERY"))
    # match target is path AND query ('/x.php?q=1' must defeat the end
    # anchor in '/*.php$' — the RFC/Google worked examples), empty path
    # normalizes to '/'
    path = F.concat(
        F.when(raw_path.isNull() | (raw_path == ""), F.lit("/")).otherwise(
            raw_path
        ),
        F.when(query.isNotNull(), F.concat(F.lit("?"), query)).otherwise(
            F.lit("")
        ),
    )
    matched = F.filter(
        F.col("rfc_rules"), lambda rl: _rule_matches(path, rl)
    )
    best = F.array_max(
        F.transform(
            matched,
            lambda rl: F.struct(
                F.length(rl["pattern"]).alias("l"), rl["allow"].alias("allow")
            ),
        )
    )
    blocked_pred = F.when(
        F.col("rfc_rules").isNotNull() & best.isNotNull(), ~best["allow"]
    ).otherwise(F.lit(False))
    return joined.withColumn(blocked_col, blocked_pred).drop("rfc_rules")


def rfc_robots_gate(
    frontier: DataFrame, robots: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """(allowed, blocked) split of `rfc_robots_tag` — see its docstring;
    prefer the tag form when both sides are consumed in one plan."""
    tagged = rfc_robots_tag(frontier, robots)
    allowed = tagged.where(~F.col("_blocked")).drop("_blocked")
    blocked = tagged.where(F.col("_blocked")).drop("_blocked")
    return allowed, blocked


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
