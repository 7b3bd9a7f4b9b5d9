"""Engine configuration.

Mirrors the reference's flat config/exec-context structs
(reference: config/config.go:9-44, execcontext/execcontext.go:14-78)
as a frozen dataclass. Defaults match the reference's `config.New()`
(config/config.go:28-43): GET, 1 worker, raw body, retries=0,
base retry delay 1000 ms, connect timeout 10000 ms, unthrottled.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Optional

VALID_BODY_TYPES = ("raw", "base64", "discard", "escaped", "sha256")
# reference: config/config.go:76-84 (ResponseBodyType enum)

VALID_METHODS = (
    "GET", "POST", "PUT", "DELETE", "PATCH", "HEAD", "OPTIONS", "TRACE", "CONNECT",
)
# reference: request.schema.json:9-13 (method enum)

MAX_WORKERS = 1 << 20  # reference: cli/worker_flag.go:29-39 (-W in [1, 2^20])
RETRY_DELAY_CAP_MS = 30_000  # reference: requests/requests.go:117-121
MAX_CONNS_PER_HOST = 50  # reference: requests/requests.go:29 — politeness ceiling
MAX_IDLE_CONNS = 500  # reference: requests/requests.go:28 (MaxIdleConns) — GLOBAL idle cap
IDLE_CONN_TIMEOUT_S = 90.0  # reference: requests/requests.go:31 (IdleConnTimeout)
MAX_HOST_POOLS = 1024  # bound the per-host pool registry for million-host crawls
MAX_LINE_BYTES = 1 << 20  # reference: parser/parser.go:105 (bufio 1 MB scan buffer)


@dataclass(frozen=True)
class EngineConfig:
    """Resolved runtime configuration (the reference's entire "plan":
    execcontext/execcontext.go:34-78 — there is no IR beyond this)."""

    request_method: str = "GET"
    request_headers: dict[str, str] = field(default_factory=dict)
    request_workers: int = 1          # → target partition count for the fetch stage
    response_body: str = "raw"
    json_envelope: bool = False
    retries: int = 0
    base_retry_delay_millis: int = 1_000
    connect_timeout_millis: int = 10_000
    throttle_per_second: Optional[int] = None  # None = unthrottled (MaxInt32 in ref)
    subdir_length: int = 0
    insecure: bool = False
    silent: bool = False
    color: bool = False
    # --- north-rule generalizations (no ganda counterpart) ---
    per_host_budget: int = MAX_CONNS_PER_HOST  # rows released per host per batch
    host_buckets: int = 64                     # politeness partition buckets
    skew_salt: int = 8                         # sub-splits for hot hosts
    seen_bloom_bits: int = 1 << 24             # bloom bitmap size (bits)
    seen_bloom_hashes: int = 5
    seen_cuckoo_buckets: int = 1 << 18         # cuckoo table buckets (4 slots each)
    # mock-fetch CPU realism: extra hash rounds per request simulating the
    # CPU a real HTTP transaction burns (TLS handshake, header parse,
    # chunked decode ≈ 50-200µs). 0 = pure-spec mock (0.7µs/row).
    fetch_cpu_work: int = 0

    def __post_init__(self) -> None:
        if self.response_body not in VALID_BODY_TYPES:
            raise ValueError(
                f"unknown response body type {self.response_body!r}, "
                f"valid: {VALID_BODY_TYPES}"
            )  # reference: responses/responses.go:222-223 (panic on unknown)
        if self.request_method not in VALID_METHODS:
            raise ValueError(f"invalid method {self.request_method!r}")
        if not (1 <= self.request_workers <= MAX_WORKERS):
            raise ValueError(
                f"workers must be in [1, {MAX_WORKERS}]"
            )  # reference: cli/worker_flag.go:29-39

    def with_(self, **kw) -> "EngineConfig":
        return replace(self, **kw)


def parse_header(header: str) -> tuple[str, str]:
    """'Key: value' → (Key, value); reference: config/config.go:50-58."""
    if ":" not in header:
        raise ValueError(
            "Header should be in the format 'Key: value', missing ':' -> " + header
        )
    key, value = header.split(":", 1)
    return key.strip(), value.strip()
