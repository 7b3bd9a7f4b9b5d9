"""Config surface: defaults, validation, header parsing — mirrors
config/config_test.go:27-77, execcontext/execcontext_test.go:15-111,
cli/worker_flag.go:29-39 (F6)."""

from __future__ import annotations

import pytest

from ganda_spark.config import EngineConfig, MAX_WORKERS, parse_header


def test_defaults_match_reference():
    # config/config.go:28-43
    cfg = EngineConfig()
    assert cfg.request_method == "GET"
    assert cfg.request_workers == 1
    assert cfg.response_body == "raw"
    assert cfg.retries == 0
    assert cfg.base_retry_delay_millis == 1000
    assert cfg.connect_timeout_millis == 10000
    assert cfg.json_envelope is False
    assert cfg.subdir_length == 0
    assert cfg.throttle_per_second is None


@pytest.mark.parametrize("workers", [0, -1, MAX_WORKERS + 1])
def test_worker_bounds(workers):
    # cli/worker_flag.go:29-39: [1, 2^20]
    with pytest.raises(ValueError, match="workers"):
        EngineConfig(request_workers=workers)


def test_worker_bounds_edges_ok():
    EngineConfig(request_workers=1)
    EngineConfig(request_workers=MAX_WORKERS)


def test_bad_body_type():
    # responses/responses.go:222-223
    with pytest.raises(ValueError, match="unknown response body type"):
        EngineConfig(response_body="xml")


def test_bad_method():
    with pytest.raises(ValueError, match="invalid method"):
        EngineConfig(request_method="FETCH")


def test_parse_header():
    # config/config.go:50-58: 'Key: value', trimmed
    assert parse_header("X-Token:  abc ") == ("X-Token", "abc")
    assert parse_header("A: b: c") == ("A", "b: c")  # SplitN(2)
    with pytest.raises(ValueError, match="missing ':'"):
        parse_header("not-a-header")


def test_with_override():
    cfg = EngineConfig().with_(retries=3, response_body="sha256")
    assert cfg.retries == 3 and cfg.response_body == "sha256"
    assert EngineConfig().retries == 0  # frozen original untouched
