"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed by Arrow-batched ``mapInPandas`` kernels.

The decode step tries Pillow at runtime (``fake=False``): on hosts with
codec libraries installed, image payloads decode for real
(resize-to-thumbnail → normalized pixel features). In this container no
codec library exists, so ``fake=False`` raises ``NotImplementedError``
and the default ``fake=True`` path runs a deterministic fake decoder
(seeded from the payload bytes) producing stable feature vectors.
Everything Spark-side — schema, partitioning, UDF signature, Arrow
batch shape — is identical between the two paths and tested, so the
real decoder is exercised automatically wherever Pillow is available
(tests/test_pipeline.py skipif-gates it).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pil():
    """Pillow, if installed on this host (None otherwise)."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "sample_rate int, duration_ms int"
)
FEATURE_SCHEMA = "media_id long, n_bytes int, feature array<float>"
FRAME_SCHEMA = "media_id long, frame_idx int, frame_payload binary"


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payloads + metadata)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=64 + (i % 5) * 32, dtype=np.uint8)
        rows.append(
            (
                i,
                kind,
                bytes(payload.tobytes()),
                int(rng.integers(16, 512)) if kind != "audio" else None,
                int(rng.integers(16, 512)) if kind != "audio" else None,
                16000 if kind == "audio" else None,
                int(rng.integers(100, 60000)),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: features seeded from
    the payload hash, so tests are stable and collisions meaningful."""
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little") % (2**32)
    return np.random.default_rng(seed).standard_normal(dim).astype(np.float32)


def extract_features(
    media: DataFrame, dim: int = 16, fake: bool = True, batch_hint: int = 0
) -> DataFrame:
    """Decode + feature-extract each payload via ``mapInPandas``.

    Real pipeline shape: binary column → Arrow batch → vectorized decode
    per batch → array<float> feature column. The per-batch loop is over
    *batches*, not rows-at-a-Python-call; the inner decode is the only
    per-item work (as it would be with a real codec).

    ``fake=False`` decodes image payloads with Pillow when it is
    installed on the executors (thumbnail to ~sqrt(dim)² grayscale,
    normalized pixels as the feature); non-image kinds and undecodable
    payloads fall back to the deterministic fake features so the
    output schema and row count never depend on payload health.
    """
    if not fake and _pil() is None:
        raise NotImplementedError(
            "real media decoding requires codec libraries (Pillow) not "
            "present on this host; run with fake=True for the "
            "deterministic stub"
        )

    def _real_decode(payload: bytes, d: int) -> list | None:
        import io as _io

        image_mod = _pil()
        try:
            img = image_mod.open(_io.BytesIO(payload)).convert("L")
        except Exception:
            return None
        side = max(1, int(d ** 0.5))
        img = img.resize((side, side))
        px = np.asarray(img, dtype=np.float32).ravel() / 255.0
        out = np.zeros(d, dtype=np.float32)
        out[: min(d, len(px))] = px[:d]
        return out.tolist()

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p, kind in zip(pdf["payload"], pdf["kind"]):
                real = None
                if not fake and kind == "image":
                    real = _real_decode(p, dim)
                feats.append(
                    real if real is not None else _fake_decode(p, dim).tolist()
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(fn, schema=FEATURE_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 8,
    fake: bool = True,
) -> DataFrame:
    """Frame sampling for video payloads: one output row per sampled
    frame. Frame extraction is stubbed (slices of the payload stand in
    for decoded frames); the explode/partition shape is the real one."""
    if not fake:
        raise NotImplementedError(
            "real frame extraction requires video codecs; use fake=True"
        )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, kind, payload, dur in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["duration_ms"]
            ):
                if kind != "video":
                    continue
                n = min(max_frames, max(1, int(dur) // every_ms))
                step = max(1, len(payload) // max(n, 1))
                for j in range(n):
                    ids.append(mid)
                    idxs.append(j)
                    frames.append(bytes(payload[j * step:(j + 1) * step]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_payload": frames}
            )

    return media.mapInPandas(fn, schema=FRAME_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Typed-metadata aggregation — plain JVM-side columns over the
    binary table (no decode needed): per kind, count/bytes/duration."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.round(F.avg("duration_ms"), 6).alias("avg_duration_ms"),
    )
