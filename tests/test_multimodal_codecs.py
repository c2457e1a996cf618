"""The real_codecs=True branches of the multimodal operators, exercised
END-TO-END in this container (r5 brief #7): binary PPM (P6) is a real
image format the pure-NumPy codec decodes/encodes/resizes for real; a
"video" is a concatenated PPM frame stream split by an actual parser.
Pillow, when installed, extends coverage to compressed formats (the
cross-check test below skips without it); payloads no codec handles
raise NotImplementedError instead of silently faking."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from streamforge_data_pipeline_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    _nn_resize,
    _ppm_decode,
    _ppm_encode,
    decode_features,
    resize_images,
    sample_frames,
)


def _img(w: int, h: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _media_df(spark, rows):
    """rows: (doc_id, payload_bytes, modality, w, h)"""
    data = [
        (i, bytearray(p), {"modality": m, "width": w, "height": h,
                           "n_bytes": len(p)})
        for i, p, m, w, h in rows
    ]
    return spark.createDataFrame(data, MEDIA_SCHEMA)


def test_ppm_roundtrip_and_header_grammar():
    arr = _img(13, 7, 1)
    assert np.array_equal(_ppm_decode(_ppm_encode(arr)), arr)
    # comments and extra whitespace in the header are legal PPM
    wire = b"P6\n# a comment\n 13  7\n255\n" + arr.tobytes()
    assert np.array_equal(_ppm_decode(wire), arr)
    assert _ppm_decode(b"JPEG nonsense") is None
    assert _ppm_decode(b"P6\n2 2\n65535\n" + b"\0" * 24) is None  # 2-byte maxval


def test_decode_features_real_branch_end_to_end(spark):
    imgs = [_img(8, 6, s) for s in range(3)]
    media = _media_df(
        spark,
        [(i, _ppm_encode(a), "image", 8, 6) for i, a in enumerate(imgs)],
    )
    out = {r["doc_id"]: r for r in decode_features(media, real_codecs=True).collect()}
    for i, a in enumerate(imgs):
        assert out[i]["feat_dim"] == 8 * 6 * 3
        assert abs(out[i]["feat_mean"] - float(a.mean())) < 1e-9


def test_resize_real_branch_matches_numpy_gather(spark):
    arr = _img(32, 16, 9)
    media = _media_df(spark, [(1, _ppm_encode(arr), "image", 32, 16)])
    rows = resize_images(media, target_w=8, target_h=8, real_codecs=True).collect()
    assert len(rows) == 1 and rows[0]["width"] == 8 and rows[0]["height"] == 8
    got = _ppm_decode(bytes(rows[0]["payload"]))
    assert np.array_equal(got, _nn_resize(arr, 8, 8))


def test_sample_frames_real_branch_splits_ppm_stream(spark):
    frames = [_img(4, 4, s) for s in range(6)]
    stream = b"".join(_ppm_encode(f) for f in frames)
    media = _media_df(spark, [(2, stream, "video", 4, 4)])
    rows = sample_frames(media, max_frames=3, real_codecs=True).collect()
    assert len(rows) == 3
    # evenly-strided REAL frames, bit-exact
    step = len(frames) // 3
    for i, r in enumerate(sorted(rows, key=lambda r: r["frame_idx"])):
        assert np.array_equal(_ppm_decode(bytes(r["frame"])), frames[i * step])


def test_undecodable_payload_raises_not_silently_fakes(spark):
    media = _media_df(spark, [(3, b"\x89PNG\r\n fake", "image", 1, 1)])
    with pytest.raises(Exception, match="NotImplementedError|capable codec"):
        decode_features(media, real_codecs=True).collect()


def test_stub_branch_unchanged_parity(spark):
    """The default stub path (oracle-backed registry keys) must be
    byte-stable: feat_mean is the payload byte mean, feat_dim 1."""
    payload = bytes([10, 20, 30, 40])
    media = _media_df(spark, [(4, payload, "image", 2, 2)])
    r = decode_features(media, real_codecs=False).collect()[0]
    assert r["feat_dim"] == 1 and abs(r["feat_mean"] - 25.0) < 1e-9


def test_pil_cross_check_when_available(spark):
    """When Pillow is installed, its PPM decode must agree with the
    NumPy codec bit-for-bit (skips cleanly without the dependency)."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    arr = _img(10, 5, 3)
    via_pil = np.asarray(PIL.open(io.BytesIO(_ppm_encode(arr))).convert("RGB"))
    assert np.array_equal(via_pil, arr)


def test_decode_digest_matches_golden_md5(spark):
    """r10 (r9 VERDICT #3 evidence upgrade): the distributed
    decode-digest pipeline over the seeded PPM corpus must reproduce
    the md5-of-hex of the closed-form pixel stream computed
    INDEPENDENTLY here (hashlib over the arithmetic rule, no PPM
    machinery involved) — byte-exact and order-sensitive."""
    import hashlib

    from streamforge_data_pipeline_spark.operators.multimodal import (
        decode_digest,
        synth_ppm_images,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(23)], "doc_id long"
    )
    got = {
        r["doc_id"]: (r["width"], r["height"], r["px_md5"])
        for r in decode_digest(synth_ppm_images(docs)).collect()
    }
    for d in range(23):
        w, h = 4 + d % 5, 3 + d % 4
        raw = bytes((d * 31 + i * 7) % 256 for i in range(w * h * 3))
        want = hashlib.md5(raw.hex().upper().encode()).hexdigest()
        assert got[d] == (w, h, want), d


def test_decode_digest_pil_branch_when_available(spark):
    """The PIL/installed-codec branch of the SAME golden-differential
    discipline (r9 VERDICT #3): PNG payloads (lossless, so the decoded
    bytes are the source array) decoded via the full dispatch in the
    distributed pipeline must hash to the golden md5 computed straight
    from the closed-form arrays. Skips with reason when Pillow is not
    installed — the container ships no codecs; the PPM twin above
    covers the dispatch end-to-end regardless."""
    PIL = pytest.importorskip("PIL.Image")
    import hashlib
    import io

    from streamforge_data_pipeline_spark.operators.multimodal import (
        _synth_pixels,
        decode_digest,
    )

    rows, golden = [], {}
    for d in range(12):
        w, h = 4 + d % 5, 3 + d % 4
        arr = _synth_pixels(d, w * h * 3).reshape(h, w, 3)
        buf = io.BytesIO()
        PIL.fromarray(arr, "RGB").save(buf, format="PNG")
        rows.append((d, bytearray(buf.getvalue())))
        golden[d] = (
            w, h,
            hashlib.md5(arr.tobytes().hex().upper().encode()).hexdigest(),
        )
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: (r["width"], r["height"], r["px_md5"])
        for r in decode_digest(media).collect()
    }
    assert got == golden
