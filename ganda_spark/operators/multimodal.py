"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, partition shape, Arrow batch flow through
mapInPandas) is real and tested; the actual pixel/sample decode is STUBBED
— the sandbox has no PIL/ffmpeg — behind `_decode_real`, which raises
NotImplementedError unless a decoder lib is importable. `decode_meta`
uses a deterministic fake decode (pure function of the bytes) so the batch
shape, schema, and partition behavior are exercised end-to-end.

Scale posture: binary payloads ride as parquet binary columns; decode is
an embarrassingly-parallel mapInPandas with bounded Arrow batches
(maxRecordsPerBatch) so a 100 MB video row cannot balloon a batch.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id string, n_bytes long, content_md5 string, format string, "
    "width int, height int"
)


def to_binary_table(df: DataFrame, id_col: str = "doc_id", payload_col: str = "text") -> DataFrame:
    """(id, payload binary, media_type) — the canonical multimodal shape."""
    return df.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.col(payload_col).cast("binary").alias("payload"),
        F.when(F.col(id_col) % 3 == 0, "image/jpeg")
        .when(F.col(id_col) % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
    )


def binary_meta(df: DataFrame) -> DataFrame:
    """Pure-expression metadata: byte length, head bytes hex, content hash.
    Zero Python — this is what a scan-time metadata pass looks like."""
    return df.select(
        "doc_id",
        "media_type",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.lower(F.hex(F.substring(F.col("payload"), 1, 8))).alias("head_hex"),
        F.md5("payload").alias("content_md5"),
    )


def _decode_real(payload: bytes, media_type: str):
    try:  # pragma: no cover - decoder libs absent in this environment
        from PIL import Image  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "real media decode requires PIL/ffmpeg, not present in this "
            "container; decode_meta uses the deterministic fake instead"
        )


def _fake_decode(payload: bytes, media_type: str) -> tuple[str, int, int]:
    """Deterministic stand-in: dimensions derived from the content hash —
    stable across runs/partitions, so tests can assert on it."""
    h = hashlib.md5(payload).hexdigest()
    fmt = media_type.split("/")[1]
    width = 64 + int(h[:4], 16) % 1920
    height = 64 + int(h[4:8], 16) % 1080
    return fmt, width, height


def decode_meta(binary_df: DataFrame, use_real_decoder: bool = False) -> DataFrame:
    """mapInPandas decode pass: one Arrow batch in, one metadata frame out.
    The UDF shape (iterator of batches, per-task init) is exactly what a
    real PIL/ffmpeg decode pass uses."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, mtype in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_type"]
            ):
                raw = bytes(payload) if payload is not None else b""
                if use_real_decoder:
                    _decode_real(raw, mtype)
                fmt, w, h = _fake_decode(raw, mtype)
                rows.append(
                    (
                        doc_id,
                        len(raw),
                        hashlib.md5(raw).hexdigest(),
                        fmt,
                        w,
                        h,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_bytes", "content_md5", "format", "width", "height",
                ],
            )

    return binary_df.mapInPandas(decode, DECODE_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id string, src_w int, src_h int, out_w int, out_h int, scale_bp long"
)


def resize_meta(
    binary_df: DataFrame, max_w: int = 512, max_h: int = 512,
    use_real_decoder: bool = False,
) -> DataFrame:
    """Resize pass plumbing (mapInPandas): aspect-preserving fit into a
    (max_w, max_h) box. The pixel resample itself is stubbed (`_decode_real`
    gates on PIL); the geometry — integer basis-point scale so every engine
    reproduces it bit-for-bit — is real and oracle-checked. Never upscales
    (scale_bp capped at 10000)."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, mtype in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_type"]
            ):
                raw = bytes(payload) if payload is not None else b""
                if use_real_decoder:
                    _decode_real(raw, mtype)
                _fmt, w, h = _fake_decode(raw, mtype)
                scale_bp = min(10000, max_w * 10000 // w, max_h * 10000 // h)
                rows.append(
                    (doc_id, w, h,
                     max(1, w * scale_bp // 10000),
                     max(1, h * scale_bp // 10000),
                     scale_bp)
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "src_w", "src_h", "out_w", "out_h", "scale_bp"],
            )

    return binary_df.mapInPandas(resize, RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id string, frame_idx int, offset_ms long, frame_ref string"


def sample_frames(binary_df: DataFrame, k: int = 4) -> DataFrame:
    """Frame-sampling plumbing for video rows: k evenly-spaced offsets over
    a deterministic fake duration (content-hash-derived — a real ffprobe
    returns it from the container header). Fan-out happens INSIDE the Arrow
    batch (one row per frame), the same shape a real ffmpeg keyframe pass
    produces; non-video rows are dropped."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, mtype in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_type"]
            ):
                if not str(mtype).startswith("video/"):
                    continue
                raw = bytes(payload) if payload is not None else b""
                h = hashlib.md5(raw).hexdigest()
                duration_ms = 1000 + int(h[8:14], 16) % 600000
                for i in range(k):
                    off = i * duration_ms // k
                    rows.append((doc_id, i, off, f"{doc_id}#t={off}"))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "offset_ms", "frame_ref"]
            )

    return binary_df.mapInPandas(sample, FRAME_SCHEMA)
