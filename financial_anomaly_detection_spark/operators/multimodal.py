"""Multimodal column support (north-star extension, SURVEY.md §2.10).

Media assets are opaque ``binary`` columns plus a typed metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow
``mapInPandas`` stages. The Spark-side plumbing — schemas, batch
shapes, partition-size control — is real and tested; the actual codec
calls are STUBBED behind an import-try (PIL / torchaudio / av are not
in this container): with the libraries absent, a clearly-marked
deterministic fake derived from the payload bytes is produced instead,
so the pipeline shape can be exercised end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

# Typed metadata struct carried alongside every media payload.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image|audio|video
        T.StructField("format", T.StringType()),       # png|wav|mp4|...
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),     # hex md5 of payload
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("feature_vec", T.ArrayType(T.FloatType())),
        T.StructField("decoder", T.StringType()),  # 'pil' | 'stub'
    ]
)


def attach_fake_payload(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Demo payload builder: wraps each document's text bytes as an
    opaque binary column + metadata struct, standing in for a real
    image/audio asset column in the testdata."""
    payload = F.encode(F.col(text_col), "UTF-8").cast("binary")
    meta = F.struct(
        F.lit("image").alias("media_type"),
        F.lit("fake").alias("format"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("checksum"),
    )
    return df.select(F.col(id_col), payload.alias("payload"), meta.alias("media_meta"))


def decode_image_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    feature_dim: int = 16,
) -> DataFrame:
    """Decode + feature-extract over the binary column via mapInPandas.

    With PIL installed the payload is decoded for real; otherwise a
    STUB produces deterministic pseudo-features from the payload md5
    (clearly tagged ``decoder='stub'``). Batch shape, output schema and
    Arrow transfer are identical either way — that is the part that
    must hold at scale.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:  # pragma: no cover - codec libs absent in this container
            from PIL import Image  # noqa: F401
            import io

            have_pil = True
        except ImportError:
            have_pil = False

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                if have_pil:
                    try:
                        img = Image.open(io.BytesIO(raw))
                        import numpy as np

                        arr = np.asarray(img, dtype=float)
                        h, w = arr.shape[:2]
                        ch = 1 if arr.ndim == 2 else arr.shape[2]
                        mean_i = float(arr.mean())
                        vec = arr.mean(axis=tuple(range(arr.ndim - 1)))[:feature_dim]
                        vec = list(map(float, vec)) + [0.0] * (feature_dim - len(vec))
                        out.append((doc_id, w, h, ch, mean_i, vec, "pil"))
                        continue
                    except Exception:
                        pass
                # STUB: deterministic pseudo-decode from the digest —
                # NOT a real decode; tagged so downstream can tell.
                digest = hashlib.md5(raw).digest()
                w = 64 + digest[0] % 192
                h = 64 + digest[1] % 192
                ch = 3
                mean_i = digest[2] / 255.0 * 255.0 / 2
                vec = [float(b) / 255.0 for b in digest[:feature_dim]]
                vec += [0.0] * (feature_dim - len(vec))
                out.append((doc_id, w, h, ch, mean_i, vec, "stub"))
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "width", "height", "channels",
                    "mean_intensity", "feature_vec", "decoder",
                ],
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        _decode, schema=IMAGE_FEATURES_SCHEMA
    )
