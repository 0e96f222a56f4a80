"""Stdlib-only real image codecs: 24-bit BMP and 8-bit PNG (zlib).

The reference ingests real image formats via ``cv2.imdecode``
(pyspark_yolox.py:65-67, pyspark_dominant.py:33-35). This container has
no cv2/PIL, so P4's real-format leg is implemented from the published
file-format specs with nothing but ``struct`` and ``zlib`` — BMP
(BITMAPINFOHEADER, uncompressed 24-bit) and PNG (IHDR/IDAT/IEND,
bit-depth 8, color types 0/2/6, all five row filters). Arrays are
RGB-ordered H×W×C uint8 — the engine convention (cv2's BGR is converted
at this boundary, where the reference converts too).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

BMP_MAGIC = b"BM"
PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# --------------------------------------------------------------------------
# BMP — BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40), bpp=24, BI_RGB.
# Rows are stored bottom-up, pixels little-endian BGR, rows padded to 4.
# --------------------------------------------------------------------------

_BMP_FILE = struct.Struct("<2sIHHI")
_BMP_INFO = struct.Struct("<IiiHHIIiiII")


def encode_bmp(arr: np.ndarray) -> bytes:
    """uint8 H×W×3 RGB (or H×W gray) → 24-bit uncompressed BMP bytes."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    if a.shape[2] != 3:
        raise ValueError(f"BMP encode needs 3 channels, got {a.shape[2]}")
    h, w, _ = a.shape
    stride = (w * 3 + 3) & ~3
    pad = b"\x00" * (stride - w * 3)
    # bottom-up rows, RGB → BGR
    body = b"".join(a[r, :, ::-1].tobytes() + pad for r in range(h - 1, -1, -1))
    off = _BMP_FILE.size + _BMP_INFO.size
    return (
        _BMP_FILE.pack(BMP_MAGIC, off + len(body), 0, 0, off)
        + _BMP_INFO.pack(40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
        + body
    )


def decode_bmp(buf: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → uint8 H×W×3 RGB array."""
    magic, _, _, _, off = _BMP_FILE.unpack_from(buf)
    if magic != BMP_MAGIC:
        raise ValueError("not a BMP stream")
    hdr_size, w, h, planes, bpp, comp = struct.unpack_from("<IiiHHI", buf, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only 24-bit uncompressed BMP (bpp={bpp}, comp={comp})")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(buf, dtype=np.uint8, count=h * stride, offset=off)
    a = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        a = a[::-1]
    return np.ascontiguousarray(a[:, :, ::-1])  # BGR → RGB


# --------------------------------------------------------------------------
# PNG — critical chunks only; bit depth 8; color type 0 (gray), 2 (RGB),
# 6 (RGBA); filters 0-4 per the spec's reconstruction functions.
# --------------------------------------------------------------------------


def _chunk(tag: bytes, payload: bytes) -> bytes:
    raw = tag + payload
    return struct.pack(">I", len(payload)) + raw + struct.pack(">I", zlib.crc32(raw))


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 H×W (gray), H×W×3 (RGB) or H×W×4 (RGBA) → PNG bytes
    (filter 0 rows, one zlib IDAT)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color_type = {1: 0, 3: 2, 4: 6}.get(c)
    if color_type is None:
        raise ValueError(f"PNG encode supports 1/3/4 channels, got {c}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + a[r].tobytes() for r in range(h))
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _unfilter(ftype: int, row: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """PNG filter reconstruction (spec §9): row is modified in place."""
    if ftype == 0:
        return row
    if ftype == 2:  # Up — vectorizable, no intra-row dependency
        row += prev
        return row
    n = len(row)
    if ftype == 1:  # Sub
        for i in range(bpp, n):
            row[i] = (int(row[i]) + int(row[i - bpp])) & 0xFF
    elif ftype == 3:  # Average
        for i in range(n):
            a = int(row[i - bpp]) if i >= bpp else 0
            row[i] = (int(row[i]) + ((a + int(prev[i])) >> 1)) & 0xFF
    elif ftype == 4:  # Paeth
        for i in range(n):
            a = int(row[i - bpp]) if i >= bpp else 0
            b = int(prev[i])
            c = int(prev[i - bpp]) if i >= bpp else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            row[i] = (int(row[i]) + pred) & 0xFF
    else:
        raise NotImplementedError(f"PNG filter type {ftype}")
    return row


def decode_png(buf: bytes) -> np.ndarray:
    """PNG bytes → uint8 H×W×C RGB(A)/gray array (bit depth 8, color
    types 0/2/6, no interlace)."""
    if buf[:8] != PNG_MAGIC:
        raise ValueError("not a PNG stream")
    pos, idat, meta = 8, [], None
    while pos < len(buf):
        (length,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4 : pos + 8]
        payload = buf[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            meta = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = meta
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise NotImplementedError(
            f"PNG depth={depth} comp={comp} filter={filt} interlace={interlace}"
        )
    channels = {0: 1, 2: 3, 6: 4}.get(color_type)
    if channels is None:
        raise NotImplementedError(f"PNG color type {color_type}")
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        ftype = raw[r * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=r * (stride + 1) + 1
        ).copy()
        prev = _unfilter(ftype, row, prev, channels)
        out[r] = prev
    return out.reshape(h, w, channels) if channels > 1 else out.reshape(h, w)
