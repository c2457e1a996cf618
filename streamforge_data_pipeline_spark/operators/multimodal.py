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


def media_summary(media: DataFrame) -> DataFrame:
    """Relational ops over multimodal metadata: filter + project +
    aggregate without touching payload bytes (column pruning keeps the
    binary column out of the scan entirely)."""
    return (
        media.select("doc_id", "meta.modality", "meta.n_bytes", "meta.width")
        .filter(F.col("modality") != "text")
    )
