"""Multimodal column plumbing (image/audio/video as opaque binary).

The Spark-side contract is real and tested — schemas, partitioning,
Arrow batch shapes, UDF signatures — while the actual codec calls are
STUBBED behind ``_decode_image_stub`` (the sandbox has no
PIL/ffmpeg). Swap the stub for a real decoder on a cluster with the
libs installed; nothing else changes.

Pattern: media rides as ``binary`` + typed metadata columns; decode /
feature-extract / resize / frame-sample run as ``mapInPandas`` over
batches sized by ``spark.sql.execution.arrow.maxRecordsPerBatch`` so
a 10 MB image never materializes more than one batch of rows at a
time per task.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image|audio|video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload_sha", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FEATURE_DIM = 16


try:  # real codec when the cluster ships it; the sandbox does not
    from PIL import Image as _PILImage

    HAS_PIL = True
except ImportError:  # pragma: no cover - sandbox path
    _PILImage = None
    HAS_PIL = False


def _decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB: a real implementation would be e.g. PIL.Image.open →
    resize → np.asarray. Deterministic fake: 16 floats derived from
    the digest of the payload's hex encoding so tests can pin values
    AND a SQL oracle can reproduce them (DuckDB's sha256 is
    VARCHAR-only, so hashing the hex string keeps the contract
    cross-engine verifiable)."""
    d = hashlib.sha256(payload.hex().encode("ascii")).digest()
    return np.frombuffer(d[:FEATURE_DIM * 4], dtype=np.uint8)[
        : FEATURE_DIM
    ].astype(np.float32) / 255.0


def _decode_image_pil(payload: bytes) -> np.ndarray | None:
    """Real decode (import-guarded): grayscale 4×4 thumbnail →
    FEATURE_DIM floats in [0, 1]. None on undecodable payloads."""
    import io

    try:
        img = _PILImage.open(io.BytesIO(payload)).convert("L").resize((4, 4))
    except Exception:  # noqa: BLE001 - non-image bytes fall back to the stub
        return None
    return (
        np.asarray(img, dtype=np.float32).reshape(-1)[:FEATURE_DIM] / 255.0
    )


def decode_feature(payload: bytes, codec: str = "stub") -> np.ndarray:
    """The swap point (VERDICT r2 #8). ``codec``:

    - ``stub``  — deterministic digest features; the oracle-contract
      variant (DuckDB reproduces the math).
    - ``pil``   — require the real decoder (raises if absent).
    - ``auto``  — real decode when PIL is importable AND the payload
      decodes; digest stub otherwise. Same row contract either way.
    """
    if codec == "pil" or (codec == "auto" and HAS_PIL):
        if not HAS_PIL:
            raise RuntimeError("codec='pil' requested but PIL is not installed")
        out = _decode_image_pil(payload)
        if out is not None and out.size == FEATURE_DIM:
            return out
    return _decode_image_stub(payload)


def extract_features(media: DataFrame, codec: str = "stub") -> DataFrame:
    """Vectorized decode+featurize over Arrow batches. ``codec`` picks
    the decode path (see decode_feature); the oracle entry keeps the
    default stub so the contract row is engine-reproducible."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, shas, sizes = [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                feats.append(decode_feature(b, codec).tolist())
                shas.append(hashlib.sha1(b).hexdigest())
                sizes.append(len(b))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": sizes,
                    "payload_sha": shas,
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: rows (media_id, frame_ts_ms) the
    decoder would extract — pure column math, no codec needed."""
    v = media.filter(F.col("kind") == "video")
    return v.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests/bench."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (1 + i % 4)
        rows.append(
            (
                i, kind, bytearray(payload), f"{kind}/x-synthetic",
                64 + i % 128 if kind == "image" else None,
                64 + i % 64 if kind == "image" else None,
                (1000 * (1 + i % 10)) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
