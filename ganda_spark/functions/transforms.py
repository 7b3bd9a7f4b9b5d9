"""Response-body transforms and the JSON output envelope (T1-T8).

Each reference transform (responses/responses.go:209-300, enum
config/config.go:76-84) becomes a Catalyst Column expression — JVM-side,
whole-stage-codegen'd, no Python in the hot path. Byte-for-byte semantics
are pinned by the reference's golden matrix
(cli/cli_response_output_test.go:42-124) and tests/test_transforms.py.

Emit model: every transform returns the *bytes written* as a nullable
string column — NULL means "the emitter wrote nothing" (empty body for
sha256/escaped/raw, always for discard). The plain sink prints
`value + "\n"` only for non-empty writes (responses/responses.go:91-103);
the JSON envelope substitutes `null` (responses/responses.go:168-174).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# T1-T5: body transforms (responses/responses.go:226-300)
# ---------------------------------------------------------------------------


def _nonempty(col: Column) -> Column:
    return col.isNotNull() & (F.length(col) > 0)


def go_json_escape(col: Column) -> Column:
    """JSON-escape a string the way Go's encoding/json does, as a pure
    Column expression chain (reference behavior: responses/responses.go:284
    uses json.Marshal, which escapes `\\`, `"`, control chars, and
    HTML-escapes `<` `>` `&` to \\u003c/\\u003e/\\u0026).

    Returns the escaped *contents* (no surrounding quotes). Covers the
    characters that occur in text corpora: backslash, quote, \\n \\t \\r,
    and the HTML trio. Arbitrary control bytes are handled by the exact
    pandas fallback in ganda_spark.functions.goexact (used by golden tests).
    """
    c = F.regexp_replace(col, r"\\", r"\\\\")
    c = F.regexp_replace(c, '"', '\\\\"')
    c = F.regexp_replace(c, "\n", r"\\n")
    c = F.regexp_replace(c, "\t", r"\\t")
    c = F.regexp_replace(c, "\r", r"\\r")
    c = F.regexp_replace(c, "<", r"\\u003c")
    c = F.regexp_replace(c, ">", r"\\u003e")
    c = F.regexp_replace(c, "&", r"\\u0026")
    return c


def body_output(body: Column, mode: str) -> Column:
    """bytes-written column for one ResponseBodyType.

    reference:
      raw     responses/responses.go:226-229 (io.Copy; empty ⇒ 0 bytes)
      sha256  responses/responses.go:231-250 (hex digest; empty ⇒ nothing)
      base64  responses/responses.go:252-263 (std encoding)
      escaped responses/responses.go:265-295 (json.Marshal string; empty ⇒ nothing)
      discard responses/responses.go:297-300 (always nothing)
    """
    if mode == "raw":
        return F.when(_nonempty(body), body)
    if mode == "sha256":
        return F.when(_nonempty(body), F.sha2(body.cast("binary"), 256))
    if mode == "base64":
        # Spark's base64 is MIME-chunked (CRLF every 76 chars); the
        # reference uses Go's StdEncoding (responses.go:258 — no breaks).
        return F.when(
            _nonempty(body),
            F.regexp_replace(F.base64(body.cast("binary")), "[\\r\\n]", ""),
        )
    if mode == "escaped":
        return F.when(
            _nonempty(body), F.concat(F.lit('"'), go_json_escape(body), F.lit('"'))
        )
    if mode == "discard":
        return F.lit(None).cast("string")
    raise ValueError(f"unknown response body type {mode}")  # responses.go:222


def plain_output(body: Column, mode: str) -> Column:
    """What the stdout printer emits per row, WITHOUT trailing newline —
    NULL rows emit nothing at all (responses/responses.go:91-103: newline
    only when bytesWritten > 0)."""
    return body_output(body, mode)


# ---------------------------------------------------------------------------
# T6: JSON envelope (responses/responses.go:127-201)
# ---------------------------------------------------------------------------

_QUOTED_MODES = {"sha256", "base64"}  # responses.go:148-159: quoted iff nonempty
_UNQUOTED_MODES = {"raw", "escaped", "discard"}  # emitted verbatim


def json_envelope(
    url: Column,
    code: Column,
    body: Column,
    mode: str,
    context_json: Optional[Column] = None,
) -> Column:
    """`{ "url": U, "code": C, "body": B[, "context": X] }` with the
    reference's exact hand-built spacing (responses/responses.go:138-142) —
    deliberately NOT to_json, whose spacing differs.

    `context_json` must already be compact-marshaled JSON (or NULL);
    a NULL / 'null' context omits the field (responses.go:177-190).
    """
    out = body_output(body, mode)
    if mode in _QUOTED_MODES:
        body_part = F.when(
            out.isNotNull(), F.concat(F.lit('"'), out, F.lit('"'))
        ).otherwise(F.lit("null"))
    else:
        body_part = F.coalesce(out, F.lit("null"))

    pieces = [
        F.lit('{ "url": "'),
        url,
        F.lit('", "code": '),
        code.cast("string"),
        F.lit(', "body": '),
        body_part,
    ]
    if context_json is not None:
        ctx = F.when(
            context_json.isNotNull() & (context_json != F.lit("null")),
            F.concat(F.lit(', "context": '), context_json),
        ).otherwise(F.lit(""))
        pieces.append(ctx)
    pieces.append(F.lit(" }"))
    return F.concat(*pieces)


# ---------------------------------------------------------------------------
# T7/T8: file-sink naming (responses/responses.go:21,63,325-343)
# ---------------------------------------------------------------------------


def sanitize_filename(url: Column) -> Column:
    """URL → filename: every non-alphanumeric run becomes '-'
    (responses/responses.go:21,63)."""
    return F.regexp_replace(url, "[^A-Za-z0-9]+", "-")


def shard_dir(filename: Column, subdir_length: int) -> Column:
    """md5-prefix directory shard: 2 hex chars for subdir_length in [1,2],
    4 for >2, none for <=0 (responses/responses.go:325-343 — byte-count
    rule at :330-336). At 10^10 scale this is exactly Spark's
    partitionBy/bucketing; we keep the hash for layout parity."""
    if subdir_length <= 0:
        return F.lit(None).cast("string")
    nchars = 2 if subdir_length <= 2 else 4
    return F.substring(F.md5(filename.cast("binary")), 1, nchars)
