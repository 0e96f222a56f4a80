"""Progressive JPEG codec (images/jpeg_progressive.py): the decoder is
checked against the BASELINE codec (same coefficients → identical
pixels once the refinement ladder restores full precision), not just
against its own encoder — plus structural conformance, EOB-run
coverage, subsampled variants, and the truncation-fuzz quarantine
contract shared with the baseline tests.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bigdata_imgprocessing_spark.images.jpeg import decode_jpeg, encode_jpeg
from bigdata_imgprocessing_spark.images.jpeg_progressive import (
    _PAC_VALS,
    encode_jpeg_progressive,
)


def test_progressive_table_is_spec_legal():
    # EOB1..EOB14 present on top of the baseline 162 symbols
    assert len(_PAC_VALS) == 176
    for r in range(1, 15):
        assert (r << 4) in _PAC_VALS
    assert 0x00 in _PAC_VALS and 0xF0 in _PAC_VALS


def test_marker_structure_and_scan_script():
    img = np.arange(16 * 24 * 3, dtype=np.uint8).reshape(16, 24, 3)
    buf = encode_jpeg_progressive(img)
    assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
    assert buf.find(bytes([0xFF, 0xC2])) > 0  # SOF2, not SOF0
    assert buf.find(bytes([0xFF, 0xC0])) == -1
    # color script: DC first + 4 AC first (split luma band) + DC refine
    # + 3 AC refine = 9 SOS segments
    n_sos = buf.count(bytes([0xFF, 0xDA]))
    assert n_sos == 9


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(4, 32),
    w=st.integers(4, 32),
    seed=st.integers(0, 2**31 - 1),
)
def test_progressive_equals_baseline_decode(h, w, seed):
    """The Al=1 → Ah=1/Al=0 refinement ladder restores every coefficient
    bit, so progressive decode must be BYTE-IDENTICAL to decoding the
    baseline encoding of the same image — one assertion pins the DC
    first/refine, AC first/refine, EOBn, and spectral-band reassembly
    paths simultaneously against an independently tested decoder."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg_progressive(img))
    assert prog.shape == img.shape
    assert (prog == base).all()


def test_progressive_gray_equals_baseline():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(17, 13), dtype=np.uint8)
    assert (
        decode_jpeg(encode_jpeg_progressive(img))
        == decode_jpeg(encode_jpeg(img))
    ).all()


@pytest.mark.parametrize("mode", ["420", "422"])
def test_progressive_subsampled_roundtrip(mode):
    """Chroma-subsampled progressive (what camera/web encoders emit):
    non-MCU-multiple sizes exercise the per-component AC block grids
    (ceil dims, NOT the MCU-padded grid) against the interleaved DC
    scan's MCU walk."""
    rng = np.random.default_rng(11)
    for h, w in ((16, 16), (17, 23), (31, 15)):
        gray = rng.integers(40, 216, size=(h, w), dtype=np.uint8)
        img = np.stack([gray, gray, gray], axis=2)
        out = decode_jpeg(encode_jpeg_progressive(img, subsampling=mode))
        assert out.shape == img.shape
        err = int(np.abs(out.astype(int) - img.astype(int)).max())
        assert err <= 6, f"{mode} {h}x{w} err={err}"


def test_flat_color_long_eob_runs_exact():
    """A large flat image makes every AC band empty → the encoder
    accumulates EOB runs across all 48+ blocks and flushes one EOBn
    with extension bits; decode must be exact (DC-only, integral
    coefficients with all-ones quant)."""
    for rgb in ((13, 200, 77), (0, 0, 0), (255, 255, 255)):
        img = np.zeros((64, 96, 3), dtype=np.uint8)
        img[:] = rgb
        out = decode_jpeg(encode_jpeg_progressive(img))
        assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 1


def test_progressive_via_magic_dispatch():
    from bigdata_imgprocessing_spark.images.codec import decode_image

    img = np.full((8, 16, 3), (10, 20, 30), dtype=np.uint8)
    out = decode_image(encode_jpeg_progressive(img))
    assert out.shape == (8, 16, 3)
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 1


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), frac=st.floats(0.01, 0.99))
def test_progressive_truncation_fuzz(seed, frac):
    """Quarantine contract: any prefix raises a clean ValueError, or —
    when the cut lands between complete scans or after the last scan's
    bits — decodes to a correctly-shaped array (progressive renders
    partial precision by design; never IndexError, never a hang)."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(8, 16, 3), dtype=np.uint8)
    buf = encode_jpeg_progressive(img)
    cut = max(2, int(len(buf) * frac))
    try:
        out = decode_jpeg(buf[:cut])
    except ValueError:
        return
    assert out.shape == img.shape


def test_bad_scan_header_is_corruption():
    img = np.full((8, 8, 3), 90, dtype=np.uint8)
    buf = bytearray(encode_jpeg_progressive(img))
    sos = buf.find(bytes([0xFF, 0xDA]))
    (ln,) = np.frombuffer(bytes(buf[sos + 2 : sos + 4]), dtype=">u2")
    # corrupt the first scan's Se byte (DC scan must have Se=0)
    buf[sos + 2 + int(ln) - 2] = 63
    with pytest.raises(ValueError):
        decode_jpeg(bytes(buf))
