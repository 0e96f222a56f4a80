"""Stdlib-only real image codecs: BMP and PNG (zlib).

The reference ingests real image formats via ``cv2.imdecode``
(pyspark_yolox.py:65-67, pyspark_dominant.py:33-35). This container has
no cv2/PIL, so P4's real-format leg is implemented from the published
file-format specs with nothing but ``struct`` and ``zlib``:

- **BMP** (BITMAPINFOHEADER, uncompressed): 24-bit BGR, 32-bit
  BGRA/BGRX (padding byte dropped), and 8-bit palette; top-down and
  bottom-up row orders.
- **PNG** (IHDR/PLTE/tRNS/IDAT/IEND): color types 0 (gray), 2 (RGB),
  3 (palette → RGB/RGBA), 4 (gray+alpha), 6 (RGBA); bit depths
  1/2/4/8/16 (sub-byte samples spec-scaled to 8-bit, 16-bit reduced to
  the high byte); all five row filters; interlace none AND Adam7.

Arrays are RGB-ordered H×W×C uint8 — the engine convention (cv2's BGR
is converted at this boundary, where the reference converts too).
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


def encode_bmp(arr: np.ndarray, bpp: int = 24) -> bytes:
    """uint8 H×W×3 RGB (or H×W gray) → uncompressed BMP bytes.
    ``bpp=24`` writes BGR rows padded to 4 bytes; ``bpp=32`` writes
    BGRX (zero padding byte) — both BI_RGB, bottom-up."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    if a.shape[2] != 3:
        raise ValueError(f"BMP encode needs 3 channels, got {a.shape[2]}")
    if bpp not in (24, 32):
        raise ValueError("BMP encode supports bpp 24 or 32")
    h, w, _ = a.shape
    if bpp == 32:
        px = np.zeros((h, w, 4), dtype=np.uint8)
        px[:, :, :3] = a[:, :, ::-1]  # BGRX
        body = b"".join(px[r].tobytes() for r in range(h - 1, -1, -1))
    else:
        stride = (w * 3 + 3) & ~3
        pad = b"\x00" * (stride - w * 3)
        # bottom-up rows, RGB → BGR
        body = b"".join(
            a[r, :, ::-1].tobytes() + pad for r in range(h - 1, -1, -1)
        )
    off = _BMP_FILE.size + _BMP_INFO.size
    return (
        _BMP_FILE.pack(BMP_MAGIC, off + len(body), 0, 0, off)
        + _BMP_INFO.pack(40, w, h, 1, bpp, 0, len(body), 2835, 2835, 0, 0)
        + body
    )


def decode_bmp(buf: bytes) -> np.ndarray:
    """Uncompressed BMP bytes → uint8 H×W×3 RGB array. Supports the
    three forms seen on disk: 24-bit BGR, 32-bit BGRA/BGRX (alpha
    byte dropped — BI_RGB's 4th byte is padding by spec), and 8-bit
    palette (BGRX color table at the end of the info header)."""
    magic, _, _, _, off = _BMP_FILE.unpack_from(buf)
    if magic != BMP_MAGIC:
        raise ValueError("not a BMP stream")
    hdr_size, w, h, planes, bpp, comp = struct.unpack_from("<IiiHHI", buf, 14)
    if bpp not in (8, 24, 32) or comp != 0:
        raise NotImplementedError(
            f"only 8/24/32-bit uncompressed BMP (bpp={bpp}, comp={comp})"
        )
    bottom_up = h > 0
    h = abs(h)
    nbytes = bpp // 8
    stride = (w * nbytes + 3) & ~3
    rows = np.frombuffer(buf, dtype=np.uint8, count=h * stride, offset=off)
    a = rows.reshape(h, stride)[:, : w * nbytes].reshape(h, w, nbytes)
    if bottom_up:
        a = a[::-1]
    if bpp == 8:
        (clr_used,) = struct.unpack_from("<I", buf, 14 + 32)
        n_colors = clr_used or 256
        pal = np.frombuffer(
            buf, dtype=np.uint8, count=n_colors * 4, offset=14 + hdr_size
        ).reshape(n_colors, 4)
        idx = a[:, :, 0].astype(np.int64)
        if idx.max() >= n_colors:
            raise ValueError("BMP palette index out of range")
        return np.ascontiguousarray(pal[idx][:, :, 2::-1])  # BGRX → RGB
    return np.ascontiguousarray(a[:, :, 2::-1])  # BGR(A) → RGB


# --------------------------------------------------------------------------
# PNG — critical chunks only; bit depth 8; color type 0 (gray), 2 (RGB),
# 6 (RGBA); filters 0-4 per the spec's reconstruction functions.
# --------------------------------------------------------------------------


def _chunk(tag: bytes, payload: bytes) -> bytes:
    raw = tag + payload
    return struct.pack(">I", len(payload)) + raw + struct.pack(">I", zlib.crc32(raw))


# Adam7 interlace pass geometry: (xstart, ystart, xstep, ystep) per
# PNG spec §8.2 — pass k's sub-image is out[ystart::ystep, xstart::xstep].
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def encode_png(arr: np.ndarray, interlace: bool = False) -> bytes:
    """uint8 H×W (gray), H×W×3 (RGB) or H×W×4 (RGBA) → PNG bytes
    (filter 0 rows, one zlib IDAT). ``interlace=True`` emits the Adam7
    seven-pass layout (each pass an independently filtered sub-image)
    so the interlaced decode path is testable without external
    files."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color_type = {1: 0, 3: 2, 4: 6}.get(c)
    if color_type is None:
        raise ValueError(f"PNG encode supports 1/3/4 channels, got {c}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 1 if interlace else 0)
    if interlace:
        parts = []
        for xs, ys, dx, dy in _ADAM7:
            sub = a[ys::dy, xs::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue  # empty pass emits nothing (spec §8.2)
            parts.append(
                b"".join(b"\x00" + sub[r].tobytes() for r in range(sub.shape[0]))
            )
        raw = b"".join(parts)
    else:
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


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # per color type


def _png_rows(raw: bytes, offset: int, w: int, h: int, channels: int,
              depth: int) -> tuple[np.ndarray, int]:
    """Unfilter one (sub-)image of h scanlines starting at ``offset`` in
    the decompressed stream; returns (rows as (h, w*channels) SAMPLES
    at 8-bit — sub-byte depths unpacked, 16-bit reduced to the high
    byte per the spec's 8-bit sample reduction — and the next offset)."""
    bits_per_px = channels * depth
    stride = (w * bits_per_px + 7) // 8  # filtered bytes per scanline
    bpp = max(1, bits_per_px // 8)  # filter distance in BYTES (spec §9)
    out = np.empty((h, w * channels), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        ftype = raw[offset]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride,
                            offset=offset + 1).copy()
        offset += 1 + stride
        prev = _unfilter(ftype, row, prev, bpp)
        if depth == 8:
            out[r] = prev[: w * channels]
        elif depth == 16:
            out[r] = prev[: w * channels * 2 : 2]  # high byte
        else:  # 1/2/4-bit packed samples, big-endian within each byte
            unpacked = np.unpackbits(prev.reshape(-1, 1), axis=1)
            grouped = unpacked.reshape(-1, 8 // depth, depth)
            weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
            vals = (grouped * weights).sum(axis=2).reshape(-1)
            out[r] = vals[: w * channels].astype(np.uint8)
    return out, offset


def decode_png(buf: bytes) -> np.ndarray:
    """PNG bytes → uint8 H×W×C array. Full static-image envelope: color
    types 0 (gray), 2 (RGB), 3 (palette → RGB, or RGBA with tRNS),
    4 (gray+alpha), 6 (RGBA); bit depths 1/2/4/8/16 (sub-byte samples
    scaled to 8-bit per the spec's sample-depth scaling, 16-bit reduced
    to the high byte); interlace 0 (none) and 1 (Adam7)."""
    if buf[:8] != PNG_MAGIC:
        raise ValueError("not a PNG stream")
    pos, idat, meta, plte, trns = 8, [], None, None, None
    while pos < len(buf):
        (length,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4 : pos + 8]
        payload = buf[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            meta = struct.unpack(">IIBBBBB", payload)
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(payload, dtype=np.uint8)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = meta
    if comp != 0 or filt != 0 or interlace not in (0, 1):
        raise NotImplementedError(
            f"PNG comp={comp} filter={filt} interlace={interlace}"
        )
    channels = _PNG_CHANNELS.get(color_type)
    if channels is None:
        raise NotImplementedError(f"PNG color type {color_type}")
    if depth not in (1, 2, 4, 8, 16) or (
        depth < 8 and color_type not in (0, 3)
    ) or (depth == 16 and color_type == 3):
        raise ValueError(f"invalid PNG depth {depth} for color type {color_type}")
    raw = zlib.decompress(b"".join(idat))
    if interlace:
        out = np.zeros((h, w, channels), dtype=np.uint8)
        offset = 0
        for xs, ys, dx, dy in _ADAM7:
            pw = (w - xs + dx - 1) // dx
            ph = (h - ys + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue
            rows, offset = _png_rows(raw, offset, pw, ph, channels, depth)
            out[ys::dy, xs::dx] = rows.reshape(ph, pw, channels)
        samples = out.reshape(h, w * channels)
    else:
        samples, _ = _png_rows(raw, 0, w, h, channels, depth)
    img = samples.reshape(h, w, channels)
    if color_type == 3:  # palette indices → RGB(A)
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        idx = img[:, :, 0].astype(np.int64)
        if idx.max() >= len(plte):
            raise ValueError("PNG palette index out of range")
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(len(plte), 255, dtype=np.uint8)
            alpha[: len(trns)] = trns
            return np.dstack([rgb, alpha[idx]])
        return np.ascontiguousarray(rgb)
    if depth < 8:  # gray sample scaling: v * 255 / (2^d - 1), exact
        img = (img.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(np.uint8)
    if channels == 1:
        return img.reshape(h, w)
    return img
