"""Multimodal column plumbing: opaque binary payloads + typed metadata.

North-star extension (SURVEY.md §2.C). Convention: media travels as an
opaque ``binary`` payload column plus typed metadata columns; decode /
feature-extract / resize / frame-sample are Arrow-batched ``mapInPandas``
stages so the heavy per-item work runs vectorized in Python workers without
ever collecting blobs to the driver.

The real image/audio decoders are not available in this environment, so the
decode stage is a DETERMINISTIC FAKE clearly marked below: it derives pixel
dimensions from the payload's sha256 digest. The fake is intentionally
SQL-expressible so the full mapInPandas pipeline is value-checked against
the DuckDB oracle — the Spark-side plumbing (schemas, batch iteration,
partitioning) is exactly what a PIL/ffmpeg-backed decoder would use; only
the bytes→pixels math is swapped.

100 TB posture: payloads stay out-of-row in the executor stream (never
``collect()``-ed), stages are map-only (zero shuffles), and Arrow batching
keeps the Python boundary amortized.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # real decoder if ever present — not in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

#: Output schema of the decode stage.
DECODE_SCHEMA = (
    "doc_id BIGINT, n_bytes BIGINT, sha256 STRING, mime STRING, "
    "width BIGINT, height BIGINT, channels BIGINT"
)

#: Output schema of the feature-extraction stage.
FEATURES_SCHEMA = "doc_id BIGINT, feature ARRAY<DOUBLE>"


def with_blob(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stand-in payload builder: utf-8 bytes of a text column as the opaque
    binary payload (the fixtures carry no real media; the column shape —
    BINARY + metadata — is the convention under test)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("image/x-fake").alias("mime"),
    )


def _fake_decode(payload: bytes) -> tuple[str, int, int, int]:
    """DETERMINISTIC FAKE decode: dimensions from the sha256 digest.

    A real implementation opens the payload with PIL/ffmpeg; this derivation
    (hex digest slices mod 1024, +1) is reproducible in SQL so the pipeline
    is oracle-checkable end to end.
    """
    digest = hashlib.sha256(payload).hexdigest()
    width = int(digest[:4], 16) % 1024 + 1
    height = int(digest[4:8], 16) % 1024 + 1
    return digest, width, height, 3


def decode_images(df: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """mapInPandas decode stage: (doc_id, payload, mime) → typed metadata.

    Arrow-batched; each pandas batch is processed vectorized and yields one
    output frame — no per-row Python round trips beyond the decode itself
    (which is inherently per-item, as with a real decoder).
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: executor Python workers may not have this
        # package on their import path (only the driver does), so the stage
        # references stdlib/pandas names exclusively — cloudpickle then ships
        # the whole function by value. Mirrors _fake_decode above.
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            meta = []
            for p in pdf["payload"]:
                digest = _hashlib.sha256(p).hexdigest()
                meta.append(
                    (digest, int(digest[:4], 16) % 1024 + 1, int(digest[4:8], 16) % 1024 + 1, 3)
                )
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "sha256": [m[0] for m in meta],
                    "mime": pdf["mime"],
                    "width": [m[1] for m in meta],
                    "height": [m[2] for m in meta],
                    "channels": [m[3] for m in meta],
                }
            )

    return df.mapInPandas(decode, schema=DECODE_SCHEMA)


def extract_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature stage: payload → ``dim`` doubles in [0, 1).

    Stand-in for an embedding model forward pass; derives components from
    sha256 so outputs are deterministic. Same batch shape a real model
    server / ONNX session would consume.
    """

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # self-contained for worker-side pickling (see decode_images)
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            vecs = []
            for p in pdf["payload"]:
                digest = _hashlib.sha256(p).hexdigest()
                vecs.append(
                    [int(digest[4 * i : 4 * i + 4], 16) / 65536.0 for i in range(dim)]
                )
            yield _pd.DataFrame({"doc_id": pdf["doc_id"], "feature": vecs})

    return df.mapInPandas(features, schema=FEATURES_SCHEMA)


def resize_meta(decoded: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning stage: target dimensions preserving aspect ratio.

    Pure column math (JVM-side) — a real resize would be another mapInPandas
    stage consuming (payload, target_w, target_h); the planning half is the
    part with engine semantics.
    """
    scale = F.when(
        F.greatest("width", "height") > max_side,
        F.greatest("width", "height").cast("double") / max_side,
    ).otherwise(F.lit(1.0))
    return decoded.select(
        "doc_id",
        "width",
        "height",
        F.floor(F.col("width") / scale).cast("bigint").alias("target_w"),
        F.floor(F.col("height") / scale).cast("bigint").alias("target_h"),
    )


def sample_frames(
    decoded: DataFrame, frames_col: str = "width", every_n: int = 10
) -> DataFrame:
    """Frame-sampling stage shape for video payloads: every ``every_n``-th
    frame index in [0, n_frames) exploded to one row per sampled frame.
    ``frames_col`` holds the per-item frame count (a real decoder emits it;
    the fake reuses a metadata column). Map-only; the explode fan-out is the
    same plan a real frame sampler produces."""
    idx = F.sequence(F.lit(0), F.col(frames_col) - 1, F.lit(every_n))
    return decoded.select("doc_id", F.explode(idx).alias("frame_idx"))
