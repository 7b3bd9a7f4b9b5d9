"""URL canonicalization + identity hashing (T9 — north-rule generalization;
the reference fetches URLs verbatim and leaves uniqueness to the upstream
pipe, reference README.md:28-30).

All pure Column expressions: parse_url / regexp / xxhash64 / sha2 stay
inside whole-stage codegen — zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def url_host(url: Column) -> Column:
    """Lower-cased host component (politeness bucket key)."""
    return F.lower(F.parse_url(url, F.lit("HOST")))


def canonicalize_url(url: Column) -> Column:
    """Canonical form used as seen-set identity:
    - scheme and host lower-cased
    - fragment stripped
    - default ports stripped (:80 http, :443 https)
    - trailing '?' stripped
    """
    c = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(c, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    tail = F.regexp_replace(rest, r"^[^/?]*", "")
    hostport = F.when(
        scheme == F.lit("http"), F.regexp_replace(hostport, r":80$", "")
    ).when(
        scheme == F.lit("https"), F.regexp_replace(hostport, r":443$", "")
    ).otherwise(hostport)
    tail = F.regexp_replace(tail, r"\?$", "")
    return F.concat(scheme, F.lit("://"), hostport, tail)


TRACKING_PREFIXES = ("utm_",)
TRACKING_PARAMS = ("fbclid", "gclid", "msclkid", "igshid", "mc_eid")


def canonicalize_params(
    url: Column,
    strip_prefixes: tuple[str, ...] = TRACKING_PREFIXES,
    strip_params: tuple[str, ...] = TRACKING_PARAMS,
) -> Column:
    """Query-parameter canonicalization — the second half of seen-set
    identity (T9 handles scheme/host/port/fragment): drop tracking
    parameters (utm_*, fbclid, ...) that fan one logical page out into
    unbounded URL aliases, then sort the survivors, so parameter ORDER
    stops defeating the URL-seen set. Composes after canonicalize_url
    (fragments already stripped there). A bare or fully-stripped query
    loses its '?'. Pure Column expressions (split / filter / array_sort /
    array_join) — byte-wise ASCII sort, reproducible by an external
    oracle."""
    base = F.regexp_extract(url, r"^([^?#]*)", 1)
    query = F.regexp_extract(url, r"^[^?#]*\?([^#]*)", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: ~(
                F.substring_index(p, "=", 1).isin(*strip_params)
                | _any_prefix(p, strip_prefixes)
            ),
        )
    )
    return (
        F.when(query == "", base)
        .when(F.size(kept) == 0, base)
        .otherwise(F.concat(base, F.lit("?"), F.array_join(kept, "&")))
    )


def _any_prefix(p: Column, prefixes: tuple[str, ...]) -> Column:
    cond = F.lit(False)
    for pre in prefixes:
        cond = cond | F.substring_index(p, "=", 1).startswith(pre)
    return cond


def url_trap_metrics(
    df,
    url_col: str = "url",
    max_depth: int = 16,
    max_params: int = 8,
    max_repeat: int = 3,
    max_len: int = 2048,
):
    """Spider-trap guards for the frontier: calendar loops, session-id
    explosions, and infinitely-deep generated paths burn crawl budget at
    10^10-URL scale, so eligible URLs are gated BEFORE politeness/fetch.

    Metrics (all pure Column regexp/array expressions — shuffle-free,
    applied as a projection on the frontier scan):
      depth           path-segment count
      n_params        query-parameter count
      max_seg_repeat  occurrences of the most-repeated path segment
                      (the /cal/2024/cal/2024/... trap signature)
      url_len         total URL length
    trap_reason ∈ {depth, params, repeat, length, ok} (first rule that
    fires, in that fixed order); is_trap = reason ≠ ok.

    Path/query come from regexp (not parse_url) so an RE2 oracle computes
    byte-identical values: group-1 extraction yields '' (never NULL) in
    both engines when a component is absent.
    """
    path = F.regexp_extract(
        F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    query = F.regexp_extract(F.col(url_col), r"^[^?#]*\?([^#]*)", 1)
    # materialize path first so the filter lambda sees a named column
    out = (
        df.withColumn("_p", path)
        .withColumn("_q", query)
        .withColumn("_segs", F.expr("filter(split(_p, '/'), s -> s != '')"))
    )
    depth = F.size("_segs").cast("long")
    n_params = (
        F.when(F.col("_q") == "", F.lit(0))
        .otherwise(F.size(F.split(F.col("_q"), "&")))
        .cast("long")
    )
    max_seg_repeat = F.expr(
        "CASE WHEN size(_segs) > 0 THEN "
        "array_max(transform(array_distinct(_segs), "
        "x -> size(filter(_segs, y -> y = x)))) ELSE 0 END"
    ).cast("long")
    url_len = F.length(F.col(url_col)).cast("long")
    out = (
        out.withColumn("depth", depth)
        .withColumn("n_params", n_params)
        .withColumn("max_seg_repeat", max_seg_repeat)
        .withColumn("url_len", url_len)
        .drop("_p", "_q", "_segs")
    )
    reason = (
        F.when(F.col("depth") > max_depth, F.lit("depth"))
        .when(F.col("n_params") > max_params, F.lit("params"))
        .when(F.col("max_seg_repeat") >= max_repeat, F.lit("repeat"))
        .when(F.col("url_len") > max_len, F.lit("length"))
        .otherwise(F.lit("ok"))
    )
    return out.withColumn("trap_reason", reason).withColumn(
        "is_trap", F.col("trap_reason") != "ok"
    )


def url_hash64(url: Column) -> Column:
    """64-bit identity hash for the seen set — xxhash64 is JVM-native and
    the right key at 10^10 scale (bloom + anti-join key)."""
    return F.xxhash64(url)


def url_hash_hex(url: Column) -> Column:
    """Portable hex identity (sha256) — used where an external oracle
    (DuckDB) must compute the identical key."""
    return F.sha2(url.cast("binary"), 256)
