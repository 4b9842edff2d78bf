"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side plumbing — schema, partitioning, mapInPandas batch shape,
Arrow transfer of binary — is real and tested. The actual media DECODE is
stubbed (no image/audio libs in this container): ``decode_stub=True``
produces a deterministic fake (seeded from the content digest) so the
pipeline shape can be verified end-to-end; passing decode_stub=False raises
NotImplementedError at the decode step, the marked integration point for
pillow/torchaudio/ffmpeg on a real cluster.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),       # image | audio | video
    T.StructField("payload", T.BinaryType()),
    T.StructField("mime", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.IntegerType()),
])

FEATURE_DIM = 16

_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("digest", T.StringType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
])


def extract_features(media: DataFrame, *, decode_stub: bool = True,
                     batch_hint: int = 256) -> DataFrame:
    """Decode + feature-extract media payloads via mapInPandas (Arrow binary
    batches; one decode call per row inside a vectorized batch loop)."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            feats = np.zeros((n, FEATURE_DIM), np.float32)
            digests = []
            nbytes = np.zeros(n, np.int64)
            for i in range(n):
                payload = pdf["payload"].iloc[i]
                d = hashlib.sha256(payload).digest()
                digests.append(d.hex()[:16])
                nbytes[i] = len(payload)
                if decode_stub:
                    # deterministic fake decode: features seeded by digest
                    seed = int.from_bytes(d[:8], "big") % (2**32)
                    feats[i] = np.random.default_rng(seed).standard_normal(
                        FEATURE_DIM).astype(np.float32)
                else:
                    raise NotImplementedError(
                        "real media decode requires pillow/torchaudio/ffmpeg "
                        "— not available in this container")
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": nbytes,
                "digest": digests,
                "features": list(feats),
            })

    return media.mapInPandas(_run, schema=_FEATURE_SCHEMA)


def sample_frames(media: DataFrame, *, every_ms: int = 1000,
                  decode_stub: bool = True) -> DataFrame:
    """Frame-sampling plumbing for video payloads: one output row per
    sampled timestamp with a (stubbed) frame digest. Demonstrates the
    1→N mapInPandas fan-out shape used by real frame extraction."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_ts_ms", T.IntegerType()),
        T.StructField("frame_digest", T.StringType()),
    ])

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, tss, digs = [], [], []
            for i in range(len(pdf)):
                if not decode_stub:
                    raise NotImplementedError("real frame decode needs ffmpeg")
                dur = int(pdf["duration_ms"].iloc[i] or 0)
                payload = pdf["payload"].iloc[i]
                base = hashlib.sha256(payload).hexdigest()
                for ts in range(0, max(dur, 1), every_ms):
                    ids.append(int(pdf["media_id"].iloc[i]))
                    tss.append(ts)
                    digs.append(hashlib.sha256(
                        f"{base}:{ts}".encode()).hexdigest()[:16])
            yield pd.DataFrame({"media_id": ids, "frame_ts_ms": tss,
                                "frame_digest": digs})

    return media.filter(F.col("kind") == "video").mapInPandas(_run, out_schema)


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (binary payloads)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.integers(0, 256, 128 + (i % 64), dtype=np.uint8))
        rows.append((i, kind, payload,
                     {"image": "image/png", "audio": "audio/wav",
                      "video": "video/mp4"}[kind],
                     64 + i % 512 if kind == "image" else None,
                     64 + i % 256 if kind == "image" else None,
                     (1 + i % 5) * 1000 if kind != "image" else None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
