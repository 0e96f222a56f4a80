"""Image codec front door: FIMG, real BMP/PNG (stdlib), cv2 fallback.

The reference decodes JPEGs with ``cv2.imdecode(np.frombuffer(...))``
(pyspark_yolox.py:65-67, pyspark_dominant.py:33-35). This container has
no cv2/PIL, so ``decode_image`` dispatches on magic bytes: the trivial
FIMG container (magic + h + w + channels + raw uint8 pixels) for
synthetic fixtures, REAL 24-bit BMP and 8-bit PNG via the stdlib-only
codecs in ``images.formats`` (so a real on-disk format is first-class
with no native deps), and cv2 for anything else when importable (the
JPEG slot-in). Everything downstream (average color, k-means dominant
color, resize) operates on the decoded ndarray identically.
"""

from __future__ import annotations

import struct

import numpy as np

try:  # pragma: no cover - cv2 absent in this container
    import cv2  # type: ignore

    _HAS_CV2 = True
except ImportError:
    _HAS_CV2 = False

_MAGIC = b"FIMG"
_HEADER = struct.Struct(">4sHHB")  # magic, height, width, channels


def encode_image(arr: np.ndarray) -> bytes:
    """uint8 HxWxC (or HxW) array → FIMG bytes."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    return _HEADER.pack(_MAGIC, h, w, c) + a.tobytes()


def decode_image(buf: bytes) -> np.ndarray:
    """Bytes → uint8 HxWxC ndarray. FIMG; BMP (24/32-bit + 8-bit
    palette); PNG (gray/RGB/RGBA/palette/gray+alpha, depths 1-16,
    Adam7 interlace); and JPEG — baseline
    (interleaved, non-interleaved multi-scan, AND partially
    interleaved), progressive, LOSSLESS (SOF3), 12-bit extended-
    sequential gray AND color (>>4 uint8 contract), 4:4:4 / 4:2:2 /
    4:2:0 / gray, plus 4-component Adobe CMYK/YCCK at BOTH precisions
    (12-bit CMYK landed r9) — all natively
    (stdlib+numpy codecs — the reference's actual *.jpg ingest format
    decodes without cv2); the remaining exotic variants
    (arithmetic-coded, hierarchical) fall through to cv2 when available,
    else the codec's NotImplementedError propagates (documented gate).
    All paths return RGB channel order — cv2 decodes BGR, so its
    results are channel-reversed here."""
    from .formats import BMP_MAGIC, PNG_MAGIC, decode_bmp, decode_png
    from .jpeg import JPEG_MAGIC, decode_jpeg

    if buf[:4] == _MAGIC:
        magic, h, w, c = _HEADER.unpack_from(buf)
        return np.frombuffer(buf, dtype=np.uint8, offset=_HEADER.size).reshape(h, w, c)
    if buf[:2] == BMP_MAGIC:
        return decode_bmp(buf)
    if buf[:8] == PNG_MAGIC:
        return decode_png(buf)
    if buf[:2] == JPEG_MAGIC:
        try:
            return decode_jpeg(buf)
        except NotImplementedError:
            if not _HAS_CV2:
                raise
            bgr = cv2.imdecode(  # pragma: no cover
                np.frombuffer(buf, dtype=np.uint8), cv2.IMREAD_COLOR
            )
            if bgr is None:  # pragma: no cover - cv2 signals failure as None
                raise ValueError("cv2 could not decode JPEG stream")
            return np.ascontiguousarray(bgr[:, :, ::-1])  # pragma: no cover
    if _HAS_CV2:  # pragma: no cover
        bgr = cv2.imdecode(np.frombuffer(buf, dtype=np.uint8), cv2.IMREAD_COLOR)
        if bgr is None:
            raise ValueError("cv2 could not decode image bytes")
        return np.ascontiguousarray(bgr[:, :, ::-1])
    raise NotImplementedError(
        "unrecognized image format (FIMG, BMP, PNG, and baseline JPEG "
        "decode natively; cv2/PIL absent in this container)"
    )
