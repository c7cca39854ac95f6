"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio decode libraries are absent from this environment, so the
decode step is STUBBED (deterministic fake features / NotImplementedError),
but the Spark-side plumbing — binary schema, Arrow batch shape, mapInPandas
signature, partition behavior — is real and tested. Swap ``_fake_feature``
for a real decoder (PIL/torchvision/librosa) on a cluster that has one.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, n_bytes long, sha16 string"
)
FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, width int, height int, "
    "feat_mean double, feat_dim int"
)


def to_media(docs: DataFrame) -> DataFrame:
    """documents -> opaque binary payload column + typed metadata.

    (In production the payload column IS the stored bytes; here it's the
    utf-8 encoding of text, which keeps everything deterministic.)
    """
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        payload.alias("payload"),
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
        F.substring(F.md5(payload), 1, 16).alias("sha16"),
    )


def decode_image(payload: bytes) -> np.ndarray:
    """Real decoder hook — intentionally unimplemented in this container."""
    raise NotImplementedError(
        "image decode requires PIL/opencv, not present in this environment; "
        "use _fake_feature for deterministic plumbing tests"
    )


def _fake_feature(payload: bytes) -> tuple[int, int, float, int]:
    """Deterministic stand-in for decode+feature-extract: (w, h, mean, dim).

    Derives pseudo-dimensions and a mean 'pixel' value from the payload
    bytes so tests pin real numbers through the Arrow boundary.
    """
    d = hashlib.blake2b(payload, digest_size=8).digest()
    w = 64 + d[0] % 192
    ht = 64 + d[1] % 192
    arr = np.frombuffer(payload[:4096], dtype=np.uint8)
    mean = float(arr.mean()) if arr.size else 0.0
    return w, ht, round(mean, 6), 16


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        ws, hs, means, dims = [], [], [], []
        for payload in pdf["payload"]:
            w, ht, mean, dim = _fake_feature(bytes(payload) if payload is not None else b"")
            ws.append(w)
            hs.append(ht)
            means.append(mean)
            dims.append(dim)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["n_bytes"],
                "width": np.array(ws, dtype=np.int32),
                "height": np.array(hs, dtype=np.int32),
                "feat_mean": means,
                "feat_dim": np.array(dims, dtype=np.int32),
            }
        )


def media_features(docs: DataFrame) -> DataFrame:
    """Full multimodal plumbing: binary column -> Arrow batches -> per-item
    decode stub -> typed feature rows."""
    return to_media(docs).mapInPandas(_extract_features, schema=FEATURE_SCHEMA)


def media_meta(docs: DataFrame) -> DataFrame:
    """JVM-only metadata view (the SQL-oracle-checkable face of to_media)."""
    return to_media(docs).select("doc_id", "media_type", "n_bytes", "sha16")


def media_resize(
    docs: DataFrame, *, max_side: int = 64
) -> DataFrame:
    """Resize plumbing for image payloads: aspect-preserving target dims
    from the (stubbed) decoded dimensions — the pixel resample itself
    needs PIL/opencv and stays behind decode_image; the dimension math,
    schema, and batch shape are real.

    -> (doc_id, width, height, out_w, out_h, scale).
    """
    feat = media_features(docs).filter(F.col("media_type") == "image/png")
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side)
        / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return feat.select(
        "doc_id",
        "width",
        "height",
        F.greatest(
            F.lit(1), F.round(F.col("width") * scale).cast("int")
        ).alias("out_w"),
        F.greatest(
            F.lit(1), F.round(F.col("height") * scale).cast("int")
        ).alias("out_h"),
        F.round(scale, 6).alias("scale"),
    )


FRAME_WINDOW = 256
FRAME_STRIDE = 512


def frame_sample(
    docs: DataFrame, *, window: int = FRAME_WINDOW, stride: int = FRAME_STRIDE
) -> DataFrame:
    """Sample 'frames' from video payloads: one row per fixed-size byte
    window at a fixed stride — the frame-extraction plumbing (explode
    shape, per-frame hashing, offset bookkeeping) with the codec decode
    stubbed as deterministic byte windows. Swap the window slicer for a
    real demuxer (pyav/ffmpeg) where available; the Spark shape stays.

    -> (doc_id, frame_idx, offset, sha16). Payloads shorter than one
    window emit no rows.
    """
    media = to_media(docs).filter(F.col("media_type") == "video/mp4")

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            offs: list[int] = []
            shas: list[str] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload) if payload is not None else b""
                i = 0
                off = 0
                while off + window <= len(buf):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    offs.append(off)
                    shas.append(
                        hashlib.md5(buf[off : off + window]).hexdigest()[:16]
                    )
                    i += 1
                    off += stride
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": np.array(idxs, dtype=np.int32),
                    "offset": np.array(offs, dtype=np.int64),
                    "sha16": shas,
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        sample, schema="doc_id long, frame_idx int, offset long, sha16 string"
    )
