"""Multimodal column handling: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: the payload is an opaque
``BINARY`` column (never parsed by Catalyst), metadata travels in typed
columns, and decode/feature-extraction runs as Arrow-batched ``mapInPandas``
so each task touches one partition's payloads without driver involvement.

The codec libraries (Pillow/ffmpeg/torchaudio) are not in this container, so
the decode kernels are STUBS — ``decode= "fake"`` produces a deterministic
feature from the bytes (real Spark plumbing: schema, batching, partitioning
are all live and tested); ``decode="real"`` raises NotImplementedError at
the exact point a codec call would go.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "media_id long, kind string, payload binary, width int, height int, sample_rate int"


def synth_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payload = seeded bytes)."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int")).alias("kind"),
        F.sha2(F.concat(F.col("id").cast("string"), F.lit(f":{seed}")), 256).cast("binary").alias("payload"),
        (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(1920)) + 1).cast("int").alias("width"),
        (F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(1080)) + 1).cast("int").alias("height"),
        F.lit(16000).alias("sample_rate"),
    )
    return df


def extract_features(media: DataFrame, dim: int = 16, decode: str = "fake") -> DataFrame:
    """Binary payload → feature vector via Arrow-batched mapInPandas.

    ``decode="real"`` marks where PIL/ffmpeg decode would run (not available
    here → NotImplementedError). ``decode="fake"`` derives a deterministic
    float vector from sha256(payload) — same batch shape, schema, and
    partitioning as the real path.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if decode == "real":
                raise NotImplementedError(
                    "media codecs unavailable in this environment; plug "
                    "PIL.Image.open / av.open here"
                )
            feats = []
            for payload in pdf["payload"]:
                # one sha256 digest is 32 bytes = 16 u16 lanes; chain
                # digests for dim > 16 instead of silently truncating the
                # feature to 16 lanes (dim ≤ 16 stays bit-identical: the
                # first block is the plain digest)
                h = hashlib.sha256(bytes(payload)).digest()
                while len(h) < dim * 2:
                    h += hashlib.sha256(h[-32:]).digest()
                v = np.frombuffer(h[: dim * 2], dtype=np.uint16).astype(np.float32)
                feats.append((v / 65535.0).astype(np.float32))
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return media.select("media_id", "payload").mapInPandas(run, schema="media_id long, feature array<float>")
