"""Stdlib+numpy baseline JPEG codec (ITU-T T.81 / ISO 10918-1).

Closes the last real-format gap: the reference's actual ingest format is
``*.jpg`` via ``cv2.imdecode`` (pyspark_yolox.py:123,67;
pyspark_dominant.py:25,35), and this container has no cv2/PIL. Encoder
and decoder are implemented from the published spec with nothing but
``struct`` and numpy:

- **Decoder**: baseline sequential DCT (SOF0), 8-bit, interleaved OR
  non-interleaved multi-scan (one SOS per component — each scan's
  blocks raster the component's own grid, DC predictors reset per
  scan, and a file whose scans miss a component raises instead of
  rendering it flat), any integer-ratio sampling factors — 4:4:4,
  4:2:2, 4:2:0 (the default output of essentially every camera
  encoder), 4:1:1 — or single-component grayscale; chroma upsampled
  nearest-neighbor after per-component IDCT (spec-sufficient per T.81
  A.1.1, which leaves the upsampling filter to the implementation);
  generic DQT (8/16-bit tables) and DHT parsing (tables come from the
  stream, not hardcoded), restart markers, 0xFF00 byte-unstuffing,
  fill-byte (repeated 0xFF) skipping per B.1.1.2. Scan scripts may be
  fully interleaved, per-component, or PARTIALLY interleaved (1 < Ns <
  Nf — e.g. a luma scan plus a Cb+Cr pair scan); 4-component Adobe
  CMYK/YCCK frames decode via the APP14 transform flag (inverted-CMYK
  convention, RGB output). Progressive (SOF2) streams route to the
  sibling from-spec decoder in ``images/jpeg_progressive.py`` and
  lossless (SOF3) to ``images/jpeg_lossless.py``; 12-bit EXTENDED
  sequential (SOF1) gray AND YCbCr color decode natively with a
  documented >>4 uint8 output contract (the viewer convention —
  engine arrays are uint8); 12-bit CMYK and arithmetic/hierarchical
  streams raise NotImplementedError — the same explicit gating as the
  other codecs' unsupported variants.
- **Encoder**: SOF0 4:4:4 / 4:2:2 / 4:2:0 (or grayscale), JFIF APP0,
  canonical Huffman tables CONSTRUCTED rather than transcribed (12 DC
  size symbols at code length 4, all 162 AC (run,size) symbols at
  length 8 — Kraft-feasible, all-ones code unused, spec-legal), chroma
  box-average downsampling, default quantization tables of all ones
  (max quality: 4:4:4 round-trip error is DCT rounding only, bounded at
  ±6 per sample incl. the color transform — the property tests pin
  this; subsampled modes additionally lose chroma detail, exact only
  for chroma-smooth content).

Arrays are RGB-ordered H×W×3 (or H×W gray) uint8 — the engine
convention shared with images/formats.py.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_MAGIC = b"\xff\xd8"

# --------------------------------------------------------------------------
# 8×8 orthonormal DCT-II basis and the zigzag scan, both CONSTRUCTED
# (a transcription typo in either would silently corrupt every block;
# construction + the spec-prefix test in tests/test_jpeg.py pins them).
# --------------------------------------------------------------------------


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    t = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) / 2.0
    t[0, :] = 1.0 / (2.0 * np.sqrt(2.0))
    return t


_T = _dct_matrix()  # spatial = _T.T @ coeff @ _T; coeff = _T @ spatial @ _T.T


def _zigzag_order() -> np.ndarray:
    """Raster index of the k-th zigzag element: diagonal scan, even
    diagonals walked bottom-left→top-right, odd ones the reverse."""
    cells = [(r, c) for r in range(8) for c in range(8)]
    cells.sort(key=lambda rc: (rc[0] + rc[1],
                               rc[1] if (rc[0] + rc[1]) % 2 == 0 else rc[0]))
    return np.array([r * 8 + c for r, c in cells], dtype=np.int64)


_ZIGZAG = _zigzag_order()
_UNZIGZAG = np.argsort(_ZIGZAG)

# --------------------------------------------------------------------------
# Canonical Huffman tables for the ENCODER. The decoder never sees
# these names — it builds tables from the stream's DHT segments, so any
# spec-legal table here keeps files interoperable.
# --------------------------------------------------------------------------

_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]  # 12 codes, len 4
_DC_VALS = list(range(12))
_AC_VALS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) by the T.81 canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


_ENC_DC = _canonical_codes(_DC_BITS, _DC_VALS)
_ENC_AC = _canonical_codes(_AC_BITS, sorted(_AC_VALS))

_QUANT_ONES = np.ones(64, dtype=np.uint16)


# --------------------------------------------------------------------------
# Bit I/O
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


class _BitReader:
    """Entropy-coded segment reader: unstuffs 0xFF00, stops at markers,
    resets cleanly at RSTn."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise ValueError("JPEG entropy data exhausted mid-block")
        b = self.buf[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.buf[self.pos]
            if nxt == 0x00:
                self.pos += 1
            else:
                self.marker = nxt
                self.pos += 1
                raise ValueError("JPEG entropy data exhausted mid-block")
        self._acc = (self._acc << 8) | b
        self._n += 8

    def bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> int | None:
        """Discard partial bits and consume an RST/other marker if next."""
        self._acc = 0
        self._n = 0
        if self.marker is not None:
            m = self.marker
            self.marker = None
            return m
        if self.buf[self.pos] == 0xFF and self.buf[self.pos + 1] != 0x00:
            m = self.buf[self.pos + 1]
            self.pos += 2
            return m
        return None


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------


def _rgb_to_ycbcr(a: np.ndarray) -> np.ndarray:
    r = a[:, :, 0].astype(np.float64)
    g = a[:, :, 1].astype(np.float64)
    b = a[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=2)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=2).round(), 0, 255).astype(np.uint8)


def _blocks(plane: np.ndarray, nbv: int, nbh: int) -> np.ndarray:
    """H×W float plane → (nbv, nbh, 8, 8), edge-padded to the given
    (MCU-aligned) block grid."""
    h, w = plane.shape
    p = np.pad(plane, ((0, nbv * 8 - h), (0, nbh * 8 - w)), mode="edge")
    return p.reshape(nbv, 8, nbh, 8).swapaxes(1, 2)


def _box_downsample(plane: np.ndarray, fx: int, fy: int) -> np.ndarray:
    """Chroma downsample by an fy×fx box average (edge-padded to a
    multiple of the factor first) — the standard encoder-side filter."""
    if fx == 1 and fy == 1:
        return plane
    h, w = plane.shape
    p = np.pad(plane, ((0, (-h) % fy), (0, (-w) % fx)), mode="edge")
    return p.reshape(p.shape[0] // fy, fy, p.shape[1] // fx, fx).mean(axis=(1, 3))


def _size_of(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amplitude(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


_SUBSAMPLING = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}


def _emit_block(
    bw_: _BitWriter,
    zz: np.ndarray,
    prev_dc: int,
    enc_dc: dict | None = None,
    enc_ac: dict | None = None,
) -> int:
    """Huffman-code one zigzagged quantized block; returns its DC.
    Table overrides exist for the 12-bit encoder (wider DC categories
    and AC sizes than the canonical 8-bit tables cover)."""
    enc_dc = _ENC_DC if enc_dc is None else enc_dc
    enc_ac = _ENC_AC if enc_ac is None else enc_ac
    diff = int(zz[0]) - prev_dc
    s = _size_of(diff)
    code, ln = enc_dc[s]
    bw_.write(code, ln)
    if s:
        bw_.write(_amplitude(diff, s), s)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = enc_ac[0xF0]
            bw_.write(code, ln)
            run -= 16
        s = _size_of(v)
        code, ln = enc_ac[(run << 4) | s]
        bw_.write(code, ln)
        bw_.write(_amplitude(v, s), s)
        run = 0
    if last < 63:
        code, ln = enc_ac[0x00]  # EOB
        bw_.write(code, ln)
    return int(zz[0])


def encode_jpeg(
    arr: np.ndarray,
    quant: np.ndarray | None = None,
    restart_interval: int = 0,
    subsampling: str = "444",
    scan_mode: str = "interleaved",
) -> bytes:
    """uint8 H×W×3 RGB (or H×W gray) → baseline JFIF bytes.

    ``subsampling`` is ``"444"`` (luma and chroma full-resolution),
    ``"422"`` (chroma halved horizontally) or ``"420"`` (chroma halved
    both ways — the camera default); gray input ignores it.
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    N MCUs (DC predictors reset, bitstream re-aligned) — the
    resynchronization feature real encoders use so a corrupt byte loses
    one restart segment, not the rest of the scan; here it also
    exercises the decoder's DRI/RST path under round-trip tests.
    ``scan_mode="separate"`` emits the spec-legal NON-interleaved form
    (one SOS per component) instead of the usual single interleaved
    scan — the variant ADVICE r6 flagged as silently mis-decoded before
    the multi-scan decoder landed; with restarts, intervals count
    blocks per scan. ``scan_mode="partial"`` (color only) emits the
    PARTIALLY interleaved form — a non-interleaved luma scan followed
    by one Cb+Cr two-component interleaved scan (1 < Ns < Nf, the last
    baseline scan-script shape that used to gate to cv2)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    h, w = a.shape[:2]
    if not gray and a.shape[2] != 3:
        raise ValueError(f"JPEG encode needs 3 channels or gray, got {a.shape}")
    if subsampling not in _SUBSAMPLING:
        raise ValueError(f"subsampling must be one of {sorted(_SUBSAMPLING)}")
    q = (_QUANT_ONES if quant is None else np.asarray(quant, np.uint16)).reshape(64)
    if q.max() > 255 or q.min() < 1:
        # the emitted DQT uses the 8-bit (Pq=0) encoding; values outside
        # [1, 255] would silently truncate into a corrupt table
        raise ValueError("quant table values must be in [1, 255]")

    if gray:
        factors = [(1, 1)]
        planes = [a.astype(np.float64)]
    else:
        hy, vy = _SUBSAMPLING[subsampling]
        factors = [(hy, vy), (1, 1), (1, 1)]
        ycc = _rgb_to_ycbcr(a)
        planes = [ycc[:, :, 0]]
        for c in (1, 2):
            planes.append(_box_downsample(ycc[:, :, c], hy, vy))
    ncomp = len(planes)
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcx, mcy = -(-w // (8 * hmax)), -(-h // (8 * vmax))

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(q[_ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        hi, vi = factors[cid - 1]
        sof += struct.pack(">BBB", cid, (hi << 4) | vi, 0)  # qtable 0
    out += _seg(0xC0, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(sorted(_AC_VALS)))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))

    qf = q.reshape(8, 8).astype(np.float64)
    comp_blocks = []
    for p, (hi, vi) in zip(planes, factors):
        b = _blocks(p - 128.0, mcy * vi, mcx * hi)
        coeff = np.einsum("ij,vhjk,lk->vhil", _T, b, _T)
        comp_blocks.append(np.round(coeff / qf).astype(np.int64))

    if scan_mode == "separate":
        # spec-legal non-interleaved form: one SOS per component, blocks
        # in the component's own grid raster, DC predictor and RSTn
        # numbering reset per scan (T.81 E.2.4 / B.2.3)
        for c, (hi, vi) in enumerate(factors):
            sos = struct.pack(">BBB", 1, c + 1, 0x00) + b"\x00\x3f\x00"
            out += _seg(0xDA, sos)
            ch, cw = -(-h * vi // vmax), -(-w * hi // hmax)
            nbv, nbh = -(-ch // 8), -(-cw // 8)
            bw_ = _BitWriter()
            prev = 0
            unit = 0
            for bv in range(nbv):
                for bh_ in range(nbh):
                    if restart_interval and unit and unit % restart_interval == 0:
                        bw_.flush()
                        out += bw_.out
                        out += bytes([
                            0xFF,
                            0xD0 + ((unit // restart_interval - 1) % 8),
                        ])
                        bw_ = _BitWriter()
                        prev = 0
                    unit += 1
                    zz = comp_blocks[c][bv, bh_]
                    prev = _emit_block(bw_, zz.reshape(64)[_ZIGZAG], prev)
            bw_.flush()
            out += bw_.out
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    if scan_mode == "partial":
        if ncomp != 3:
            raise ValueError("scan_mode='partial' needs a color image")
        # scan 1: luma alone (non-interleaved raster over its own grid)
        out += _seg(0xDA, struct.pack(">BBB", 1, 1, 0x00) + b"\x00\x3f\x00")
        hy, vy = factors[0]
        ch, cw = -(-h * vy // vmax), -(-w * hy // hmax)
        nbv, nbh = -(-ch // 8), -(-cw // 8)
        bw_ = _BitWriter()
        prev = 0
        for bv in range(nbv):
            for bh_ in range(nbh):
                zz = comp_blocks[0][bv, bh_]
                prev = _emit_block(bw_, zz.reshape(64)[_ZIGZAG], prev)
        bw_.flush()
        out += bw_.out
        # scan 2: Cb+Cr interleaved over the frame MCU grid (each
        # contributes its Hi×Vi = 1×1 block per MCU)
        sos = struct.pack(">B", 2)
        for cid in (2, 3):
            sos += struct.pack(">BB", cid, 0x00)
        out += _seg(0xDA, sos + b"\x00\x3f\x00")
        bw_ = _BitWriter()
        prev_dc = [0, 0]
        for my in range(mcy):
            for mx in range(mcx):
                for c in (1, 2):
                    zz = comp_blocks[c][my, mx]
                    prev_dc[c - 1] = _emit_block(
                        bw_, zz.reshape(64)[_ZIGZAG], prev_dc[c - 1]
                    )
        bw_.flush()
        out += bw_.out
        out += b"\xff\xd9"
        return bytes(out)

    sos = struct.pack(">B", ncomp)
    for cid in range(1, ncomp + 1):
        sos += struct.pack(">BB", cid, 0x00)  # DC table 0, AC table 0
    sos += b"\x00\x3f\x00"  # spectral selection 0..63, baseline
    out += _seg(0xDA, sos)

    bw_ = _BitWriter()
    prev_dc = [0] * ncomp
    mcu = 0
    for my in range(mcy):
        for mx in range(mcx):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw_.flush()
                out += bw_.out
                out += bytes([0xFF, 0xD0 + ((mcu // restart_interval - 1) % 8)])
                bw_ = _BitWriter()
                prev_dc = [0] * ncomp
            mcu += 1
            for c, (hi, vi) in enumerate(factors):
                for dv in range(vi):
                    for dh in range(hi):
                        zz = comp_blocks[c][my * vi + dv, mx * hi + dh]
                        prev_dc[c] = _emit_block(
                            bw_, zz.reshape(64)[_ZIGZAG], prev_dc[c]
                        )
    bw_.flush()
    out += bw_.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_cmyk(
    cmyk: np.ndarray,
    transform: int = 0,
    quant: np.ndarray | None = None,
) -> bytes:
    """uint8 H×W×4 (Adobe-style INVERTED CMYK samples, i.e. 255 = no
    ink) → 4-component baseline JPEG with an Adobe APP14 segment.
    ``transform=0`` stores the planes directly; ``transform=2`` stores
    the YCCK form (inverted C,M,Y triple through the YCbCr transform,
    K direct) — the two 4-component variants decode_jpeg accepts.
    Exists so the decoder's CMYK path is testable without external
    fixtures (real-world Adobe CMYK files are press/print exports)."""
    a = np.ascontiguousarray(cmyk, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 4:
        raise ValueError(f"CMYK encode needs 4 channels, got {a.shape}")
    if transform not in (0, 2):
        raise ValueError("transform must be 0 (CMYK) or 2 (YCCK)")
    h, w = a.shape[:2]
    q = (_QUANT_ONES if quant is None else np.asarray(quant, np.uint16)).reshape(64)
    if q.max() > 255 or q.min() < 1:
        raise ValueError("quant table values must be in [1, 255]")
    if transform == 2:
        ycc = _rgb_to_ycbcr(a[:, :, :3])
        planes = [ycc[:, :, 0], ycc[:, :, 1], ycc[:, :, 2],
                  a[:, :, 3].astype(np.float64)]
    else:
        planes = [a[:, :, c].astype(np.float64) for c in range(4)]
    mcx, mcy = -(-w // 8), -(-h // 8)

    out = bytearray(b"\xff\xd8")
    out += _seg(
        0xEE, b"Adobe" + struct.pack(">HHHB", 100, 0, 0, transform)
    )
    out += _seg(0xDB, bytes([0]) + bytes(q[_ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, 4)
    for cid in range(1, 5):
        sof += struct.pack(">BBB", cid, 0x11, 0)  # 1x1 sampling, qtable 0
    out += _seg(0xC0, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(sorted(_AC_VALS)))

    qf = q.reshape(8, 8).astype(np.float64)
    comp_blocks = [
        np.round(
            np.einsum("ij,vhjk,lk->vhil", _T, _blocks(p - 128.0, mcy, mcx), _T)
            / qf
        ).astype(np.int64)
        for p in planes
    ]
    sos = struct.pack(">B", 4)
    for cid in range(1, 5):
        sos += struct.pack(">BB", cid, 0x00)
    out += _seg(0xDA, sos + b"\x00\x3f\x00")
    bw_ = _BitWriter()
    prev_dc = [0] * 4
    for my in range(mcy):
        for mx in range(mcx):
            for c in range(4):
                zz = comp_blocks[c][my, mx]
                prev_dc[c] = _emit_block(bw_, zz.reshape(64)[_ZIGZAG], prev_dc[c])
    bw_.flush()
    out += bw_.out
    out += b"\xff\xd9"
    return bytes(out)


# 12-bit tables: DC difference categories reach 15 and AC sizes 14
# (T.81 F.1.2.1 for 12-bit data) — 16 DC symbols at code length 5 and
# 226 AC symbols at length 8, both Kraft-feasible with all-ones unused.
_DC12_VALS = list(range(16))
_DC12_BITS = [0, 0, 0, 0, len(_DC12_VALS), 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_AC12_VALS = sorted(
    [0x00, 0xF0] + [(run << 4) | size for run in range(16)
                    for size in range(1, 15)]
)
_AC12_BITS = [0, 0, 0, 0, 0, 0, 0, len(_AC12_VALS), 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC12 = _canonical_codes(_DC12_BITS, _DC12_VALS)
_ENC_AC12 = _canonical_codes(_AC12_BITS, _AC12_VALS)


def encode_jpeg_12bit(
    arr: np.ndarray,
    quant: np.ndarray | None = None,
    transform: int = 0,
) -> bytes:
    """uint16 12-bit samples (0..4095) → extended sequential (SOF1)
    JPEG: H×W grayscale, H×W×3 RGB stored as 4:4:4 YCbCr with chroma
    centered at 2048 (the 12-bit analogue of the 8-bit 128 center), or
    H×W×4 Adobe-style INVERTED CMYK (r9: 4095 = no ink; ``transform=0``
    stores the planes directly, ``transform=2`` the YCCK form — the
    inverted C,M,Y triple through the YCbCr transform with 2048-center
    chroma, K direct — and either emits the Adobe APP14 segment the
    decoder keys on). The matching decode path returns uint8 via >>4
    (engine arrays are uint8), so round-trip equals ``arr >> 4``
    exactly for DC-flat gray and within one count otherwise. Exists so
    the 12-bit decode paths are testable without external fixtures
    (12-bit files are medical/raw/press exports)."""
    a = np.ascontiguousarray(arr, dtype=np.uint16)
    if a.ndim not in (2, 3) or (a.ndim == 3 and a.shape[2] not in (3, 4)):
        raise ValueError(
            f"12-bit encode needs HxW, HxWx3 or HxWx4, got {a.shape}"
        )
    if a.max() > 4095:
        raise ValueError("12-bit samples must be in [0, 4095]")
    if transform not in (0, 2):
        raise ValueError("transform must be 0 (CMYK) or 2 (YCCK)")
    h, w = a.shape[:2]
    q = (_QUANT_ONES if quant is None else np.asarray(quant, np.uint16)).reshape(64)
    if q.max() > 255 or q.min() < 1:
        raise ValueError("quant table values must be in [1, 255]")
    mcx, mcy = -(-w // 8), -(-h // 8)
    if a.ndim == 2:
        planes = [a.astype(np.float64)]
    elif a.shape[2] == 4:
        if transform == 2:
            c_, m_, y4 = (a[:, :, c].astype(np.float64) for c in range(3))
            planes = [
                0.299 * c_ + 0.587 * m_ + 0.114 * y4,
                2048.0 - 0.168736 * c_ - 0.331264 * m_ + 0.5 * y4,
                2048.0 + 0.5 * c_ - 0.418688 * m_ - 0.081312 * y4,
                a[:, :, 3].astype(np.float64),
            ]
        else:
            planes = [a[:, :, c].astype(np.float64) for c in range(4)]
    else:
        r, g, b = (a[:, :, c].astype(np.float64) for c in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            2048.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            2048.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    nc = len(planes)

    out = bytearray(b"\xff\xd8")
    if nc == 4:  # 4-component frames need the Adobe transform flag
        out += _seg(
            0xEE, b"Adobe" + struct.pack(">HHHB", 100, 0, 0, transform)
        )
    out += _seg(0xDB, bytes([0]) + bytes(q[_ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 12, h, w, nc)
    for cid in range(1, nc + 1):
        sof += struct.pack(">BBB", cid, 0x11, 0)  # 1x1 sampling, qtable 0
    out += _seg(0xC1, sof)
    out += _seg(
        0xC4,
        bytes([0x00]) + bytes(_DC12_BITS) + bytes(_DC12_VALS),
    )
    out += _seg(
        0xC4,
        bytes([0x10]) + bytes(_AC12_BITS) + bytes(_AC12_VALS),
    )
    sos = struct.pack(">B", nc)
    for cid in range(1, nc + 1):
        sos += struct.pack(">BB", cid, 0x00)
    out += _seg(0xDA, sos + b"\x00\x3f\x00")

    qf = q.reshape(8, 8).astype(np.float64)
    comp_blocks = [
        np.round(
            np.einsum("ij,vhjk,lk->vhil", _T, _blocks(p - 2048.0, mcy, mcx), _T)
            / qf
        ).astype(np.int64)
        for p in planes
    ]
    bw_ = _BitWriter()
    prev_dc = [0] * nc
    for bv in range(mcy):
        for bh_ in range(mcx):
            for c in range(nc):
                prev_dc[c] = _emit_block(
                    bw_, comp_blocks[c][bv, bh_].reshape(64)[_ZIGZAG],
                    prev_dc[c], enc_dc=_ENC_DC12, enc_ac=_ENC_AC12,
                )
    bw_.flush()
    out += bw_.out
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


class _HuffTable:
    def __init__(self, bits: bytes, vals: bytes) -> None:
        # (length, code) → symbol, decoded bit-by-bit
        self.map: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                self.map[(ln, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | br.bit()
            sym = self.map.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(buf: bytes) -> np.ndarray:
    """JPEG bytes → uint8 H×W×3 RGB (or H×W gray): baseline (any scan
    script — interleaved / per-component / partial), progressive
    (SOF2), lossless (SOF3), 12-bit extended-sequential gray, Adobe
    CMYK/YCCK, 4:4:4 / 4:2:2 / 4:2:0 / grayscale.

    Truncated/corrupt streams raise ValueError (the quarantine path
    needs a reliable exception); unsupported spec variants raise
    NotImplementedError (the cv2 slot-in gate)."""
    if buf[:2] != JPEG_MAGIC:
        raise ValueError("not a JPEG stream")
    try:
        return _decode_jpeg(buf)
    except (IndexError, struct.error, KeyError, StopIteration) as exc:
        # IndexError/struct.error: truncation; KeyError: scan references
        # an undefined quant/Huffman table id; StopIteration: SOS selects
        # a component the SOF never declared — all are stream corruption
        raise ValueError("truncated or corrupt JPEG stream") from exc


def _decode_jpeg(buf: bytes) -> np.ndarray:
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}
    comps: list[tuple[int, int, int, int]] = []  # (id, hi, vi, tq)
    h = w = 0
    restart = 0
    planes: list[np.ndarray] | None = None
    factors: list[tuple[int, int]] = []
    qf: list[np.ndarray] = []
    covered: set[int] = set()  # component indices some scan has decoded
    hmax = vmax = 1
    mcx = mcy = 0
    prec = 8
    adobe_transform = 0  # APP14 color-transform flag (0=CMYK, 2=YCCK)

    while True:
        if buf[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        while buf[pos + 1] == 0xFF:  # T.81 B.1.1.2: 0xFF fill bytes
            pos += 1
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01, *range(0xD0, 0xD8)):
            continue  # parameterless
        (ln,) = struct.unpack_from(">H", buf, pos)
        payload = buf[pos + 2 : pos + ln]
        pos += ln
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(payload):
                pq, tq = payload[i] >> 4, payload[i] & 0x0F
                i += 1
                n = 64 * (2 if pq else 1)
                raw = payload[i : i + n]
                i += n
                vals = (
                    np.frombuffer(raw, dtype=">u2").astype(np.int64)
                    if pq
                    else np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                )
                t = np.zeros(64, dtype=np.int64)
                t[_ZIGZAG] = vals
                qtables[tq] = t.reshape(8, 8)
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(payload):
                tc, th = payload[i] >> 4, payload[i] & 0x0F
                bits = payload[i + 1 : i + 17]
                n = sum(bits)
                vals = payload[i + 17 : i + 17 + n]
                htables[(tc, th)] = _HuffTable(bits, vals)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline/extended
            prec, h, w, nc = struct.unpack_from(">BHHB", payload, 0)
            if prec == 12:
                # 12-bit EXTENDED sequential (SOF1 only — baseline SOF0
                # is 8-bit by definition, B.2.2). Gray, YCbCr color and
                # (r9) Adobe CMYK/YCCK all decode natively with the
                # documented >>4 uint8 output contract.
                if marker != 0xC1:
                    raise ValueError("12-bit precision requires SOF1")
            elif prec != 8:
                raise NotImplementedError(f"only 8/12-bit JPEG (precision={prec})")
            if nc not in (1, 3, 4):
                raise NotImplementedError(f"{nc}-component JPEG unsupported")
            for c in range(nc):
                cid, samp, tq = struct.unpack_from(">BBB", payload, 3 + 3 * c + 3)
                comps.append((cid, samp >> 4, samp & 0x0F, tq))
        elif marker == 0xC2:  # SOF2: progressive DCT — sibling decoder
            from .jpeg_progressive import decode_jpeg_progressive

            return decode_jpeg_progressive(buf)
        elif marker == 0xC3:  # SOF3: lossless — sibling decoder
            from .jpeg_lossless import decode_jpeg_lossless

            return decode_jpeg_lossless(buf)
        elif marker in (0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"arithmetic/hierarchical JPEG (SOF 0xFF{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", payload, 0)
        elif marker == 0xEE and payload[:5] == b"Adobe":
            # APP14: transform byte (offset 11) distinguishes direct
            # CMYK (0) from YCCK (2) for 4-component frames
            adobe_transform = payload[11] if len(payload) > 11 else 0
        elif marker == 0xDA:  # SOS — decode this scan, keep looping
            if not comps:
                raise ValueError("JPEG missing SOF before SOS")
            if planes is None:
                if len(comps) == 1:
                    # single-component images are non-interleaved by
                    # definition: the MCU is one data unit and the
                    # declared sampling factors don't subsample
                    # anything (T.81 A.2.2)
                    factors = [(1, 1)]
                else:
                    factors = [(hi, vi) for _, hi, vi, _ in comps]
                hmax = max(f[0] for f in factors)
                vmax = max(f[1] for f in factors)
                for hi, vi in factors:
                    if (not (1 <= hi <= 4 and 1 <= vi <= 4)
                            or hmax % hi or vmax % vi):
                        raise NotImplementedError(
                            f"unsupported JPEG sampling factors {factors}"
                        )
                mcx, mcy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
                planes = [
                    np.zeros((mcy * vi * 8, mcx * hi * 8), dtype=np.float64)
                    for hi, vi in factors
                ]
                qf = [
                    qtables[tq].astype(np.float64) for _, _, _, tq in comps
                ]
            ns = payload[0]
            scan = []
            for c in range(ns):
                cs, tt = payload[1 + 2 * c], payload[2 + 2 * c]
                idx = next(i for i, cc in enumerate(comps) if cc[0] == cs)
                scan.append((idx, tt >> 4, tt & 0x0F))
            # ns == len(comps): full interleave; ns == 1: per-component
            # raster; 1 < ns < len(comps): PARTIAL interleave (e.g. a
            # luma scan followed by a Cb+Cr pair scan) — the MCU walk
            # below already handles a component subset, because the MCU
            # grid is frame-level (ceil over 8*Hmax/8*Vmax of ALL frame
            # components, T.81 A.2.3 / libjpeg per_scan_setup) and each
            # scan component contributes its own Hi×Vi blocks per MCU.
            pos = _decode_baseline_scan(
                buf, pos, htables, planes, qf, factors, scan,
                restart, mcx, mcy, h, w, hmax, vmax,
            )
            covered.update(ci for ci, _, _ in scan)
        # APPn / COM / others: skipped via the length field

    if planes is None:
        raise ValueError("JPEG has no scan data")
    if covered != set(range(len(comps))):
        # a plane that was never scanned would silently render flat 128
        raise ValueError("JPEG scans do not cover every component")
    shift = float(1 << (prec - 1))  # level shift: 128 (8-bit) / 2048 (12-bit)
    crops = []
    for (hi, vi), p in zip(factors, planes):
        ch, cw = -(-h * vi // vmax), -(-w * hi // hmax)  # comp dims (ceil)
        c = p[:ch, :cw] + shift
        if hi != hmax or vi != vmax:  # nearest-neighbor chroma upsample
            c = np.repeat(np.repeat(c, vmax // vi, axis=0), hmax // hi, axis=1)
        crops.append(c[:h, :w])
    if len(comps) == 1:
        if prec == 12:
            # engine images are uint8: scale the 12-bit plane down by
            # >>4 (the viewer convention), exact for encoder-shifted
            # test content
            v12 = np.clip(crops[0].round(), 0, 4095).astype(np.int64)
            return (v12 >> 4).astype(np.uint8)
        return np.clip(crops[0].round(), 0, 255).astype(np.uint8)
    if len(comps) == 4:
        # Adobe 4-component: stored samples are INVERTED CMYK (the only
        # 4-component form seen in the wild — libjpeg/PIL make the same
        # assumption). transform 2 (YCCK) stores the inverted C,M,Y
        # triple YCbCr-transformed; K is always direct. RGB output via
        # R = s_C * s_K / maxval (s = stored/inverted values), the
        # inverted-CMYK → RGB identity. 12-bit frames (r9) use the same
        # identity in 12-bit units — chroma/K centered & clipped at
        # 4095 — then the engine-wide >>4 uint8 output contract.
        maxv = float((1 << prec) - 1)
        ctr = float(1 << (prec - 1))
        if adobe_transform == 2:
            y_, cb_, cr_ = crops[0], crops[1], crops[2]
            sc = y_ + 1.402 * (cr_ - ctr)
            sm = y_ - 0.344136 * (cb_ - ctr) - 0.714136 * (cr_ - ctr)
            sy = y_ + 1.772 * (cb_ - ctr)
        else:
            sc, sm, sy = crops[0], crops[1], crops[2]
        sk = np.clip(crops[3], 0.0, maxv)
        rgb = np.stack(
            [np.clip(p, 0.0, maxv) * sk / maxv for p in (sc, sm, sy)],
            axis=2,
        )
        if prec == 12:
            rgb12 = np.clip(rgb.round(), 0, 4095).astype(np.int64)
            return (rgb12 >> 4).astype(np.uint8)
        return np.clip(rgb.round(), 0, 255).astype(np.uint8)
    if prec == 12:
        # 12-bit YCbCr: chroma centered at 2048, reconstruct in 12-bit
        # units, then the same >>4 uint8 output contract as gray
        y_, cb_, cr_ = crops[0], crops[1], crops[2]
        r = y_ + 1.402 * (cr_ - 2048.0)
        g = y_ - 0.344136 * (cb_ - 2048.0) - 0.714136 * (cr_ - 2048.0)
        b = y_ + 1.772 * (cb_ - 2048.0)
        rgb12 = np.clip(
            np.stack([r, g, b], axis=2).round(), 0, 4095
        ).astype(np.int64)
        return (rgb12 >> 4).astype(np.uint8)
    return _ycbcr_to_rgb(crops[0], crops[1], crops[2])


def _decode_baseline_scan(
    buf: bytes,
    pos: int,
    htables: dict[tuple[int, int], _HuffTable],
    planes: list[np.ndarray],
    qf: list[np.ndarray],
    factors: list[tuple[int, int]],
    scan: list[tuple[int, int, int]],
    restart: int,
    mcx: int,
    mcy: int,
    h: int,
    w: int,
    hmax: int,
    vmax: int,
) -> int:
    """Decode one baseline scan's entropy data (interleaved MCU walk for
    a full-interleave scan, component-grid raster for a single-component
    scan — the spec-legal non-interleaved form); returns the position of
    the next marker segment. DC predictors reset per scan and at every
    restart marker (T.81 E.2.4)."""
    br = _BitReader(buf, pos)
    prev_dc = [0] * len(factors)

    def block_into(ci: int, bv: int, bh_: int, dct, act) -> None:
        zz = np.zeros(64, dtype=np.int64)
        s = dct.decode(br)
        diff = _extend(br.bits(s), s) if s else 0
        prev_dc[ci] += diff
        zz[0] = prev_dc[ci]
        k = 1
        while k < 64:
            sym = act.decode(br)
            if sym == 0x00:  # EOB
                break
            if sym == 0xF0:  # ZRL
                k += 16
                continue
            run, size = sym >> 4, sym & 0x0F
            k += run
            if k > 63:
                raise ValueError("JPEG AC run past block end")
            zz[k] = _extend(br.bits(size), size)
            k += 1
        block = np.zeros(64, dtype=np.float64)
        block[_ZIGZAG] = zz
        coeff = block.reshape(8, 8) * qf[ci]
        planes[ci][bv * 8 : bv * 8 + 8, bh_ * 8 : bh_ * 8 + 8] = (
            _T.T @ coeff @ _T
        )

    def maybe_restart(unit: int) -> None:
        if restart and unit and unit % restart == 0:
            m = br.align_to_marker()
            if m is None or not (0xD0 <= m <= 0xD7):
                raise ValueError("JPEG restart marker expected")
            prev_dc[:] = [0] * len(factors)

    if len(scan) > 1:  # full interleave: MCU walk
        mcu = 0
        for my in range(mcy):
            for mx in range(mcx):
                maybe_restart(mcu)
                mcu += 1
                for ci, dc_id, ac_id in scan:
                    hi, vi = factors[ci]
                    dct = htables[(0, dc_id)]
                    act = htables[(1, ac_id)]
                    for dv in range(vi):
                        for dh in range(hi):
                            block_into(ci, my * vi + dv, mx * hi + dh,
                                       dct, act)
    else:  # non-interleaved: raster over the component's own block grid
        ci, dc_id, ac_id = scan[0]
        hi, vi = factors[ci]
        ch, cw = -(-h * vi // vmax), -(-w * hi // hmax)
        nbv, nbh = -(-ch // 8), -(-cw // 8)
        dct = htables[(0, dc_id)]
        act = htables[(1, ac_id)]
        unit = 0
        for bv in range(nbv):
            for bh_ in range(nbh):
                maybe_restart(unit)
                unit += 1
                block_into(ci, bv, bh_, dct, act)
    if br.marker is not None:
        return br.pos - 2
    return br.pos
