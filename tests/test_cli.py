"""CLI e2e through a real subprocess — the reference's RunGanda harness
(cli/test_helper_test.go:40-93): pipe stdin, assert stdout AND stderr.
Slow (one SparkSession per invocation) — keep the case list tight; the
transform × envelope matrix is pinned cheaply in tests/test_transforms.py.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from ganda_spark.echoserver import Echoserver

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def echo():
    with Echoserver() as srv:
        yield srv


def run_cli(args, stdin_text, timeout=180):
    proc = subprocess.run(
        [sys.executable, "-m", "ganda_spark", *args],
        input=stdin_text,
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=timeout,
    )
    # keep spark noise out of the asserted stderr
    err = "\n".join(
        l for l in proc.stderr.splitlines()
        if l.startswith(("Response: ", "\x1b")) or " Error: " in l
    )
    return proc.returncode, proc.stdout, err


def test_cli_raw_fetch_and_status_log(echo):
    url = echo.url_for("foo/1")
    code, out, err = run_cli(["-W", "2", "-B", "sha256"], url + "\n")
    assert code == 0
    assert len(out.strip()) == 64  # sha256 hex of the echo body
    assert err == f"Response: 200 {url}"  # logger/logger.go:56-62


def test_cli_json_envelope_with_context(echo):
    url = echo.url_for("bar")
    code, out, err = run_cli(
        ["-s", "-J", "-B", "discard"], url + "\tctx1\tctx2\n"
    )
    assert code == 0
    assert out == (
        f'{{ "url": "{url}", "code": 200, "body": null, '
        f'"context": ["ctx1","ctx2"] }}\n'
    )
    assert err == ""  # silent (cli_response_output_test.go:27-40)


def test_cli_404_envelope(echo):
    url = echo.url_for("status/404")
    code, out, err = run_cli(["-J"], url + "\n")
    assert out == f'{{ "url": "{url}", "code": 404, "body": null }}\n'
    assert err == f"Response: 404 {url}"


def test_cli_json_lines_input_method_override(echo):
    url = echo.url_for("anything")
    line = json.dumps({"url": url, "method": "POST", "context": "baz"})
    code, out, err = run_cli(["-s", "-J"], line + "\n")
    assert code == 0
    envelope = json.loads(out)
    assert envelope["context"] == "baz"
    assert envelope["body"]["method"] == "POST"


def test_cli_output_directory(echo, tmp_path):
    urls = [echo.url_for(f"files/{i}") for i in range(3)]
    out_dir = str(tmp_path / "save")
    code, out, err = run_cli(
        ["-s", "-o", out_dir, "-S", "2"], "\n".join(urls) + "\n"
    )
    assert code == 0 and out == ""
    files = []
    for root, _dirs, names in os.walk(out_dir):
        files += [os.path.join(root, n) for n in names]
    assert len(files) == 3
    # hashed 2-hex-char subdirs + sanitized names (responses.go:21,325-343)
    for f in files:
        rel = os.path.relpath(f, out_dir)
        shard, name = rel.split(os.sep)
        assert len(shard) == 2
        assert name.startswith("http-127-0-0-1-")
        body = json.load(open(f))
        assert body["status"] == 200


def test_cli_w1_output_order_is_input_order(echo):
    """The W=1 ordering contract (tour cell 39; single response worker,
    execcontext/execcontext.go:63-64): stdout lines in exact input order."""
    urls = [echo.url_for(f"ordered/{i}") for i in (5, 3, 9, 1, 7)]
    code, out, _err = run_cli(["-s", "-W", "1", "-J", "-B", "discard"],
                              "\n".join(urls) + "\n")
    assert code == 0
    got = [json.loads(l)["url"] for l in out.splitlines()]
    assert got == urls


def test_cli_empty_input_is_clean_noop():
    code, out, err = run_cli(["-s"], "")
    assert (code, out, err) == (0, "", "")


def test_cli_mock_fetch_offline():
    code, out, err = run_cli(
        ["-s", "--mock-fetch", "-J", "-B", "discard"],
        "http://host-1.test/order/1\n",
    )
    assert code == 0
    assert out.startswith('{ "url": "http://host-1.test/order/1", "code": ')
