"""Unit tests for the binary/image layer: codec round-trip, deterministic
k-means on non-degenerate images, and the binaryFile ingest path (S1/P1,
pyspark_yolox.py:123 / pyspark_dominant.py:25 equivalents)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdata_imgprocessing_spark.images.codec import decode_image, encode_image
from bigdata_imgprocessing_spark.images.color import _avg_color, _kmeans_dominant
from bigdata_imgprocessing_spark.images.detect import _detections_for_id


def test_codec_roundtrip():
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    assert (decode_image(encode_image(img)) == img).all()


def test_codec_grayscale_roundtrip():
    img = np.arange(12, dtype=np.uint8).reshape(4, 3)
    out = decode_image(encode_image(img))
    assert out.shape == (4, 3, 1)
    assert (out[:, :, 0] == img).all()


def test_codec_rejects_unknown_format():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0 not really a jpeg")


def test_codec_cv2_slot_in(monkeypatch):
    """The cv2 dispatch branch is live code, not dead glue: with a fake
    cv2 module patched in, non-FIMG bytes route through cv2.imdecode
    (and FIMG bytes still take the native path, never touching cv2)."""
    from bigdata_imgprocessing_spark.images import codec

    calls = []

    class FakeCv2:
        IMREAD_COLOR = 1

        @staticmethod
        def imdecode(arr, flag):
            calls.append((bytes(arr.tobytes()), flag))
            return np.full((2, 3, 3), 7, dtype=np.uint8)

    monkeypatch.setattr(codec, "_HAS_CV2", True)
    monkeypatch.setattr(codec, "cv2", FakeCv2, raising=False)

    jpeg_ish = b"\xff\xd8\xff\xe0 not really a jpeg"
    out = codec.decode_image(jpeg_ish)
    assert out.shape == (2, 3, 3) and (out == 7).all()
    assert calls == [(jpeg_ish, FakeCv2.IMREAD_COLOR)]

    # FIMG bytes bypass cv2 even when it is importable
    native = codec.decode_image(encode_image(np.zeros((4, 4, 3), np.uint8)))
    assert native.shape == (4, 4, 3)
    assert len(calls) == 1


def test_avg_color_exact():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    img[0, 0] = (10, 20, 30)
    img[0, 1] = (20, 30, 40)
    img[1, 0] = (30, 40, 50)
    img[1, 1] = (40, 50, 60)
    assert _avg_color(encode_image(img)) == [25.0, 35.0, 45.0]


def test_kmeans_dominant_majority_color():
    """16 pixels: 12 near-red, 4 near-blue → dominant ≈ red centroid."""
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[:, :] = (200, 10, 10)
    img[0, :2] = (10, 10, 200)
    img[1, :2] = (12, 10, 198)
    # slight noise on the majority so clusters aren't single points
    img[2, 0] = (198, 12, 10)
    dom = _kmeans_dominant(encode_image(img), k=2)
    assert dom[0] > 150 and dom[2] < 60  # red-ish wins


def test_kmeans_deterministic_across_calls():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    buf = encode_image(img)
    assert _kmeans_dominant(buf) == _kmeans_dominant(buf)


def test_detection_stub_deterministic_and_thresholdable():
    d1 = _detections_for_id("42")
    assert d1 == _detections_for_id("42")
    assert all(0 <= d["class_id"] < 80 and 0.0 <= d["score"] < 1.0 for d in d1)


def test_binaryfile_source_ingest(spark, tmp_path):
    """S1: glob ingest of binary files + P1 file-id extraction
    (regexp_extract of the basename, pyspark_yolox.py:93) + decode UDF."""
    from bigdata_imgprocessing_spark.images.color import average_color_udf

    for i, val in enumerate([0, 100, 255]):
        img = np.full((2, 2, 3), val, dtype=np.uint8)
        (tmp_path / f"img_{i}.fimg").write_bytes(encode_image(img))
    (tmp_path / "ignored.txt").write_text("not an image")

    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.fimg")
        .load(str(tmp_path))
    )
    assert df.count() == 3
    out = (
        df.select(
            F.regexp_extract(F.col("path"), r"([^/]+)\.fimg$", 1).alias("img_id"),
            average_color_udf("content").alias("avg"),
        )
        .orderBy("img_id")
        .collect()
    )
    assert [r.img_id for r in out] == ["img_0", "img_1", "img_2"]
    assert [r.avg[0] for r in out] == [0.0, 100.0, 255.0]


def test_letterbox_upscale_and_pad():
    from bigdata_imgprocessing_spark.images.transform import PAD_VALUE, letterbox

    img = np.array([[[10, 20, 30], [40, 50, 60]],
                    [[70, 80, 90], [100, 110, 120]]], dtype=np.uint8)
    out = letterbox(img, 4, 6)
    assert out.shape == (4, 6, 3)
    # scale 2: each source pixel becomes a 2x2 block
    assert (out[0:2, 0:2] == img[0, 0]).all()
    assert (out[2:4, 2:4] == img[1, 1]).all()
    # right strip is padding
    assert (out[:, 4:6] == PAD_VALUE).all()


def test_letterbox_downscale():
    from bigdata_imgprocessing_spark.images.transform import letterbox

    img = np.zeros((8, 8, 1), dtype=np.uint8)
    img[0:4] = 200  # top half bright
    out = letterbox(img, 4, 4)
    assert out.shape == (4, 4, 1)
    assert (out[0:2] == 200).all() and (out[2:4] == 0).all()
