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


def url_hash64(url: Column) -> Column:
    """64-bit identity hash for the seen set — xxhash64 is JVM-native and
    the right key at 10^10 scale (bloom + anti-join key)."""
    return F.xxhash64(url)


def url_hash_hex(url: Column) -> Column:
    """Portable hex identity (sha256) — used where an external oracle
    (DuckDB) must compute the identical key."""
    return F.sha2(url.cast("binary"), 256)
