"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, Arrow batch shapes, partition-friendly
UDF signatures) is real and tested; the actual codec calls are stubbed
behind ``try: import`` gates because the decode libraries (PIL, soundfile,
av) are not in this container. When absent, ``decode_fake=True`` produces a
deterministic fake derived from the payload bytes so the downstream plumbing
(feature extraction, resizing, frame sampling) is exercised end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),  # opaque bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_DDL = (
    "media_id long, kind string, n_bytes int, sha1 string, "
    "feature array<float>, decode_status string"
)

_HAVE_PIL = False
try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    pass


def synthetic_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rng = np.random.default_rng([seed, 77])
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=256 + (i % 512), dtype=np.uint8).tobytes()
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + i % 32 if kind != "audio" else None,
                48 + i % 16 if kind != "audio" else None,
                1000 + 10 * i if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_feature(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic feature from payload bytes (stands in for a real
    decoder+encoder; same shape/dtype contract as the real path)."""
    digest = hashlib.sha1(payload).digest()
    raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4], dtype="<u4")
    return (raw % 1000).astype("float32") / 1000.0


def extract_media_features(media: DataFrame, decode_fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Batched: each Arrow batch holds many payloads; per-batch numpy work only.
    The real decode path raises NotImplementedError unless the codec libs
    are importable (STUB — container has no image/audio libs).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            status = []
            sha1s = []
            nb = []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                sha1s.append(hashlib.sha1(b).hexdigest())
                nb.append(len(b))
                if decode_fake or not _HAVE_PIL:
                    feats.append(_fake_feature(b).tolist())
                    status.append("fake")
                else:  # pragma: no cover
                    raise NotImplementedError(
                        "real decode requires PIL/soundfile/av (not in container)"
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.Series(nb, dtype="int32"),
                    "sha1": sha1s,
                    "feature": feats,
                    "decode_status": status,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURE_DDL
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 250) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms) —
    pure Spark (sequence + explode), no decoding. The decode of each frame
    would run in the same mapInPandas shape as extract_media_features."""
    vids = media.filter(F.col("kind") == "video").select("media_id", "duration_ms")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
