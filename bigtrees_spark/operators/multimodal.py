"""Multimodal column plumbing: image/audio/video as opaque binary columns with
typed metadata, processed via mapInPandas.

`decode_image` is a REAL PIL decoder behind an import guard: it runs
wherever PIL exists on the executors and raises NotImplementedError here
(this container ships no image libraries — task brief), so hermetic tests
select the deterministic fake decoder instead.  Everything Spark-side —
schema, batch iteration, partitioning, output shape — is real and tested
on both paths; the PIL branch itself is covered by a skip-if-absent test.

Reference analog: the HashTree functor payload — trees optionally carry file
CONTENTS alongside metadata and ops project them away when not needed
(/root/reference/lib/System/Directory/BigTrees/HashTree/Base.hs:156,185-190,
322-326).  Our binary column is that payload; `drop_payload` is dropFileData.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("media_type", StringType(), True),   # image|audio|video
        StructField("n_bytes", IntegerType(), True),
        StructField("content_sha256", StringType(), True),
        StructField("width", IntegerType(), True),        # decode metadata
        StructField("height", IntegerType(), True),
        StructField("feature", ArrayType(FloatType()), True),  # extracted vector
    ]
)


def decode_image(payload: bytes, feat_dim: int = 8) -> tuple[int, int, np.ndarray]:
    """REAL decoder, import-guarded: decodes with PIL when it exists on the
    executor (width, height, `feat_dim`-bin grayscale histogram as the
    feature), else raises NotImplementedError — this container ships no image
    libraries, so tests exercise the fake path and the PIL branch is gated
    behind skip-if-absent (tests/test_multimodal.py)."""
    try:
        from PIL import Image
    except ImportError as exc:  # pragma: no cover — PIL absent here
        raise NotImplementedError(
            "image decoding requires an image library not present in this "
            "environment; use fake_decode for deterministic tests"
        ) from exc
    import io

    img = Image.open(io.BytesIO(payload)).convert("L")
    w, h = img.size
    arr = np.asarray(img, dtype=np.float32)
    hist, _ = np.histogram(arr, bins=feat_dim, range=(0.0, 256.0))
    feat = (hist / max(arr.size, 1)).astype(np.float32)
    return w, h, feat


def _resize_real(payload: bytes, target_w: int, target_h: int) -> bytes:
    """PIL resample + PNG re-encode (the real `resize_images` kernel)."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload)).resize((target_w, target_h))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def fake_decode(payload: bytes, feat_dim: int = 8) -> tuple[int, int, np.ndarray]:
    """Deterministic fake decoder for tests: dimensions and feature vector are
    pure functions of the payload bytes (blake2b-seeded), so results are
    stable across executors/runs — the plumbing contract is fully exercised."""
    d = hashlib.blake2b(payload or b"", digest_size=16).digest()
    width = 1 + d[0] % 64
    height = 1 + d[1] % 64
    rng = np.random.default_rng(int.from_bytes(d[2:10], "little"))
    feat = rng.standard_normal(feat_dim).astype(np.float32)
    return width, height, feat


def extract_media_features(
    media: DataFrame,
    payload_col: str = "payload",
    media_type: str = "image",
    use_fake_decoder: bool = True,
    feat_dim: int = 8,
) -> DataFrame:
    """media(url, payload binary) -> MEDIA_META_SCHEMA rows via mapInPandas.

    mapInPandas (not a scalar UDF) because decode is rows->rows with wide
    binary input: each Arrow batch is processed as a unit and the binary
    column never round-trips back to the JVM.
    """
    decoder = fake_decode if use_fake_decoder else decode_image

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "url": pdf["url"],
                "media_type": media_type,
                "n_bytes": pdf[payload_col].map(lambda b: len(b or b"")).astype("int32"),
                "content_sha256": pdf[payload_col].map(
                    lambda b: hashlib.sha256(b or b"").hexdigest()
                ),
            }
            ws, hs, feats = [], [], []
            for b in pdf[payload_col]:
                w, h, f = decoder(bytes(b or b""))
                ws.append(w)
                hs.append(h)
                feats.append(f.tolist())
            out["width"] = pd.Series(ws, dtype="int32")
            out["height"] = pd.Series(hs, dtype="int32")
            out["feature"] = feats
            yield pd.DataFrame(out)

    cols = media.select(F.col("url"), F.col(payload_col))
    return cols.mapInPandas(process, schema=MEDIA_META_SCHEMA)


def frame_sample_plan(
    media: DataFrame, payload_col: str = "payload", every_n_bytes: int = 1024
) -> DataFrame:
    """Video frame-sampling plumbing (rows -> MANY rows): emits one row per
    sampled 'frame' offset with a slice digest.  The real frame decode is the
    same stub swap; the explode/partition behavior is what's under test."""
    n = F.octet_length(F.col(payload_col))
    offsets = F.sequence(
        F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n_bytes)
    )
    return (
        media.select("url", F.col(payload_col), F.posexplode(offsets).alias("frame_idx", "offset"))
        .withColumn(
            "frame_sha256",
            F.sha2(F.substring(F.col(payload_col), F.col("offset") + 1, every_n_bytes), 256),
        )
        .drop(payload_col)
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("payload", BinaryType(), True),  # re-encoded resized image
    ]
)


def resize_images(
    media: DataFrame,
    target_w: int,
    target_h: int,
    payload_col: str = "payload",
    use_fake_decoder: bool = True,
) -> DataFrame:
    """media(url, payload binary) -> (url, width, height, payload) resized via
    mapInPandas — the decode→resize→re-encode hot loop of an image training
    pipeline.  Like extract_media_features, the decode/encode kernel is the
    swap point (PIL/libvips on a real cluster); the fake path re-encodes a
    deterministic blake2b-keyed byte string of the target size's scale so the
    batch shape, schema, and payload round-trip are fully exercised."""
    decoder = fake_decode if use_fake_decoder else decode_image

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, payloads = [], []
            for u, b in zip(pdf["url"], pdf[payload_col]):
                raw = bytes(b or b"")
                if use_fake_decoder:
                    decoder(raw)  # keep the decode call in the loop shape
                    # fake "re-encode": deterministic bytes keyed by (content,
                    # target dims) — stable across executors/retries
                    key = hashlib.blake2b(
                        raw + f"|{target_w}x{target_h}".encode(), digest_size=32
                    ).digest()
                    out_bytes = key * max(1, (target_w * target_h) // 32)
                else:
                    out_bytes = _resize_real(raw, target_w, target_h)
                urls.append(u)
                payloads.append(out_bytes)
            yield pd.DataFrame(
                {
                    "url": urls,
                    "width": pd.Series([target_w] * len(urls), dtype="int32"),
                    "height": pd.Series([target_h] * len(urls), dtype="int32"),
                    "payload": payloads,
                }
            )

    return media.select("url", F.col(payload_col)).mapInPandas(
        process, schema=RESIZED_SCHEMA
    )


def drop_payload(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """dropFileData analog (HashTree/Base.hs:322-326): project away the binary
    payload once metadata/features are extracted."""
    return df.drop(payload_col)
