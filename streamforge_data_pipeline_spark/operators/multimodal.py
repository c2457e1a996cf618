"""Multimodal column plumbing (E5).

Image/audio/video payloads are opaque BinaryType columns with a typed
metadata struct. The Spark-side plumbing — schema, partition-friendly
layout, Arrow-batched UDF signatures — is real and tested; the actual
codec work is stubbed (no image/audio libs in this container) behind
clearly-marked hooks, exactly where a production pipeline would call
PIL/ffmpeg inside mapInPandas.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_META = T.StructType(
    [
        T.StructField("modality", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META, False),
    ]
)

_MODALITIES = ["image", "audio", "video", "text"]


def attach_media(docs: DataFrame, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Build a media table from documents: payload = utf-8 bytes of the
    text (a deterministic stand-in for real image bytes), metadata
    derived arithmetically — the schema/partitioning shape of a real
    multimodal corpus."""
    payload = F.encode(F.col(text), "UTF-8")
    modality = F.element_at(
        F.array(*[F.lit(m) for m in _MODALITIES]),
        (F.col(id_col) % len(_MODALITIES) + 1).cast("int"),
    )
    meta = F.struct(
        modality.alias("modality"),
        ((F.col(id_col) * 37) % 1920).cast("int").alias("width"),
        ((F.col(id_col) * 53) % 1080).cast("int").alias("height"),
        F.length(payload).cast("long").alias("n_bytes"),
    )
    return docs.select(F.col(id_col), payload.alias("payload"), meta.alias("meta"))


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("feat_mean", T.DoubleType(), True),
        T.StructField("feat_dim", T.IntegerType(), True),
    ]
)


def decode_features(media: DataFrame, real_codecs: bool = False) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas.

    Arrow-batched: each batch arrives as a pandas DataFrame; a real
    deployment decodes payload bytes (PIL.Image.open / torchaudio) and
    emits per-item features. Here the decode step is STUBBED with a
    deterministic byte-statistic so the distributed plumbing (schema,
    batch shape, partition parallelism) is fully exercised.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if real_codecs:
                # Production hook: PIL/ffmpeg/torchaudio decode here.
                raise NotImplementedError("media codecs not available in this container")
            feat_mean = pdf["payload"].map(
                lambda b: float(sum(b) / len(b)) if b is not None and len(b) else None
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["meta"].map(lambda m: m["modality"]),
                    "feat_mean": feat_mean,
                    "feat_dim": 1,
                }
            )

    return media.mapInPandas(_batches, DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def resize_images(media: DataFrame, target_w: int = 224, target_h: int = 224,
                  real_codecs: bool = False) -> DataFrame:
    """Image resize over binary payloads (Arrow-batched).

    Production hook: PIL.Image.open(bytes) -> .resize((w,h)) -> bytes.
    Here the codec is STUBBED deterministically (payload truncated/padded
    to w*h bytes) so the distributed shape — batch signature, metadata
    update, payload column flowing through Arrow — is fully exercised.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = target_w * target_h
        for pdf in it:
            if real_codecs:
                raise NotImplementedError("image codecs not available in container")
            payload = pdf["payload"].map(
                lambda b: None if b is None else (bytes(b)[:n]).ljust(n, b"\0")
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payload,
                    "width": target_w,
                    "height": target_h,
                }
            )

    imgs = media.filter(F.col("meta.modality") == "image")
    return imgs.mapInPandas(_batches, RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def sample_frames(media: DataFrame, every_n_bytes: int = 64,
                  max_frames: int = 8, real_codecs: bool = False) -> DataFrame:
    """Video frame sampling: one row per sampled frame (1->N expansion
    through mapInPandas — the shape ffmpeg-based sampling has).

    Stub 'decoder': every_n_bytes-sized strides of the payload stand in
    for decoded frames; a real deployment seeks keyframes via ffmpeg.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if real_codecs:
                raise NotImplementedError("video codecs not available in container")
            out_ids, out_idx, out_frames = [], [], []
            for _, row in pdf.iterrows():
                b = row["payload"]
                if b is None:
                    continue
                b = bytes(b)
                for i in range(min(max_frames, max(1, len(b) // every_n_bytes))):
                    out_ids.append(row["doc_id"])
                    out_idx.append(i)
                    out_frames.append(b[i * every_n_bytes:(i + 1) * every_n_bytes])
            yield pd.DataFrame(
                {"doc_id": out_ids, "frame_idx": out_idx, "frame": out_frames}
            )

    vids = media.filter(F.col("meta.modality") == "video")
    return vids.mapInPandas(_batches, FRAMES_SCHEMA)


def media_summary(media: DataFrame) -> DataFrame:
    """Relational ops over multimodal metadata: filter + project +
    aggregate without touching payload bytes (column pruning keeps the
    binary column out of the scan entirely)."""
    return (
        media.select("doc_id", "meta.modality", "meta.n_bytes", "meta.width")
        .filter(F.col("modality") != "text")
    )
