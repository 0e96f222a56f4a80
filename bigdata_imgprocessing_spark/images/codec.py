"""Deterministic fake image codec — STUB standing in for cv2.imdecode.

The reference decodes JPEGs with ``cv2.imdecode(np.frombuffer(...))``
(pyspark_yolox.py:65-67, pyspark_dominant.py:33-35). This container has
no cv2/PIL, so images are carried in a trivial deterministic container
format ("FIMG": magic + h + w + channels + raw uint8 pixels). Everything
downstream (average color, k-means dominant color, resize) operates on
the decoded ndarray exactly as it would on a real decode; swapping in
cv2 means replacing ONLY ``decode_image``/``encode_image`` (they try
cv2 first when importable).
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
    """Bytes → uint8 HxWxC ndarray. FIMG natively; real image formats via
    cv2 when available, else NotImplementedError (documented stub)."""
    if buf[:4] == _MAGIC:
        magic, h, w, c = _HEADER.unpack_from(buf)
        return np.frombuffer(buf, dtype=np.uint8, offset=_HEADER.size).reshape(h, w, c)
    if _HAS_CV2:  # pragma: no cover
        return cv2.imdecode(np.frombuffer(buf, dtype=np.uint8), cv2.IMREAD_COLOR)
    raise NotImplementedError(
        "real image decode requires cv2/PIL (absent in this container); "
        "use the FIMG stub format from encode_image()"
    )
