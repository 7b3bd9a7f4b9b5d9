"""Golden-byte matrix for T1-T8 — fixtures ported from the reference's own
table-driven tests (cli/cli_response_output_test.go:42-124,
responses/responses_test.go, docs/GANDA_TOUR.ipynb cells 52-62).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ganda_spark.functions.transforms import (
    body_output,
    json_envelope,
    plain_output,
    sanitize_filename,
    shard_dir,
)

URL = "http://localhost:1234/bar"


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def _body_df(spark, body):
    return spark.createDataFrame([(URL, 200, body)], "url string, code int, body string")


# --- plain transforms (cli/cli_response_output_test.go:48-58) ---

@pytest.mark.parametrize(
    "mode,expected",
    [
        ("raw", "Hello /bar"),
        ("discard", None),
        ("escaped", '"Hello /bar"'),
        ("base64", "SGVsbG8gL2Jhcg=="),
        ("sha256", "13a05f3ce0f3edc94bdeee3783c969dfb27c234b6dd98ce7fd004ffc69a45ece"),
    ],
)
def test_plain_transform_goldens(spark, mode, expected):
    df = _body_df(spark, "Hello /bar")
    out = df.select(plain_output(F.col("body"), mode).alias("v")).collect()[0]["v"]
    assert out == expected


def test_sha256_second_golden(spark):
    # responses/responses_test.go:125
    df = _body_df(spark, "hello world")
    out = df.select(body_output(F.col("body"), "sha256").alias("v")).collect()[0]["v"]
    assert out == "b94d27b9934d3e08a52e52d7da7dabfac484efe37a5380ee9088f7ace2efcde9"


def test_empty_body_emits_nothing(spark):
    # sha256/escaped/raw of empty body ⇒ no output, no newline
    # (responses/responses.go:244,282-284; emitRawBody io.Copy of 0 bytes)
    df = _body_df(spark, "")
    for mode in ("raw", "sha256", "escaped", "base64", "discard"):
        out = df.select(plain_output(F.col("body"), mode).alias("v")).collect()[0]["v"]
        assert out is None, mode


# --- JSON envelope (cli/cli_response_output_test.go:71-124) ---

BODY_JSON = '{ "foo": "/bar" }'


@pytest.mark.parametrize(
    "mode,expected_body_part",
    [
        ("raw", '{ "foo": "/bar" }'),
        ("discard", "null"),
        ("escaped", '"{ \\"foo\\": \\"/bar\\" }"'),
        ("base64", '"eyAiZm9vIjogIi9iYXIiIH0="'),
        ("sha256", '"f660cd1420c6acd9408932b9983909c26ab6cb21ffb40525670a7b7aa67092ec"'),
    ],
)
def test_envelope_goldens(spark, mode, expected_body_part):
    df = _body_df(spark, BODY_JSON)
    out = df.select(
        json_envelope(F.col("url"), F.col("code"), F.col("body"), mode).alias("v")
    ).collect()[0]["v"]
    assert out == f'{{ "url": "{URL}", "code": 200, "body": {expected_body_part} }}'


@pytest.mark.parametrize("mode", ["raw", "discard", "escaped", "base64", "sha256"])
def test_envelope_404_empty_body_is_null(spark, mode):
    # cli/cli_response_output_test.go:101-124
    df = spark.createDataFrame([(URL, 404, "")], "url string, code int, body string")
    out = df.select(
        json_envelope(F.col("url"), F.col("code"), F.col("body"), mode).alias("v")
    ).collect()[0]["v"]
    assert out == f'{{ "url": "{URL}", "code": 404, "body": null }}'


def test_envelope_context_forms(spark):
    # cli/cli_response_output_test.go:126-155: string/array/object contexts,
    # compact-marshaled; null context omits the field.
    df = spark.createDataFrame(
        [(URL, 200, "", '["foo","quoted content"]'), (URL, 200, "", '"baz"'),
         (URL, 200, "", None)],
        "url string, code int, body string, ctx string",
    )
    rows = df.select(
        json_envelope(
            F.col("url"), F.col("code"), F.col("body"), "raw", context_json=F.col("ctx")
        ).alias("v")
    ).collect()
    assert rows[0]["v"] == (
        f'{{ "url": "{URL}", "code": 200, "body": null, '
        f'"context": ["foo","quoted content"] }}'
    )
    assert rows[1]["v"] == f'{{ "url": "{URL}", "code": 200, "body": null, "context": "baz" }}'
    assert rows[2]["v"] == f'{{ "url": "{URL}", "code": 200, "body": null }}'


def test_go_escaping_html_chars(spark):
    # Go json.Marshal escapes < > & (responses/responses.go:284 behavior)
    df = _body_df(spark, 'a<b>&"c"\\d\ne')
    out = df.select(body_output(F.col("body"), "escaped").alias("v")).collect()[0]["v"]
    assert out == '"a\\u003cb\\u003e\\u0026\\"c\\"\\\\d\\ne"'


# --- file naming (T7/T8) ---

def test_filename_and_shard(spark):
    # docs/GANDA_TOUR.ipynb cells 52-62: url → name + md5-prefix dir 'd8'
    df = spark.createDataFrame(
        [("http://localhost:9090/fast-api/1",)], "url string"
    )
    row = df.select(
        sanitize_filename(F.col("url")).alias("name"),
        shard_dir(sanitize_filename(F.col("url")), 2).alias("d2"),
        shard_dir(sanitize_filename(F.col("url")), 5).alias("d5"),
        shard_dir(sanitize_filename(F.col("url")), 0).alias("d0"),
    ).collect()[0]
    assert row["name"] == "http-localhost-9090-fast-api-1"
    assert row["d2"] == "d8"
    assert len(row["d5"]) == 4 and row["d5"].startswith("d8")
    assert row["d0"] is None
