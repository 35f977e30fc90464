"""PIZ codec + tiled/multi-part EXR tests.

The reference reads production EXRs through the Rust `exr` crate,
which handles PIZ, tiled, and multi-part files
(ref: lib/rust/mmimage/src/lib.rs:39-64); these tests cover the same
surface: stage-level invariants of the PIZ pipeline (bitmap/LUT,
wavelet, Huffman) plus whole-file round-trips.
"""

import os

import numpy as np
import pytest

from mayamatchmovesolver_tpu.io import _piz, exr


# ---------------------------------------------------------------------------
# Stage invariants


def test_bitmap_lut_roundtrip():
    rng = np.random.RandomState(0)
    data = rng.randint(0, 1 << 16, 4096).astype(np.uint16)
    data[:100] = 0
    bitmap, min_nz, max_nz = _piz._bitmap_from_data(data)
    fwd, max_value_f = _piz._forward_lut_from_bitmap(bitmap)
    rev, max_value_r = _piz._reverse_lut_from_bitmap(bitmap)
    assert max_value_f == max_value_r
    np.testing.assert_array_equal(rev[fwd[data]], data)
    # Compacted values are dense in [0, max_value].
    compact = fwd[data]
    assert compact.max() <= max_value_f
    # Zero always maps to zero.
    assert fwd[0] == 0 and rev[0] == 0
    # min/max nonzero bound the used bitmap bytes.
    nz = np.nonzero(bitmap)[0]
    assert min_nz == nz[0] and max_nz == nz[-1]


@pytest.mark.parametrize("shape", [(1, 1), (2, 2), (7, 5), (16, 16),
                                   (31, 33), (1, 64), (64, 1)])
@pytest.mark.parametrize("max_value", [100, 1 << 15])
def test_wavelet_roundtrip(shape, max_value):
    rng = np.random.RandomState(3)
    buf = rng.randint(0, max_value + 1, shape).astype(np.uint16)
    ref = buf.copy()
    _piz._wav2_encode(buf, max_value)
    if shape[0] > 1 and shape[1] > 1:
        assert not np.array_equal(buf, ref)  # transform did something
    _piz._wav2_decode(buf, max_value)
    np.testing.assert_array_equal(buf, ref)


def test_wavelet_14bit_2x2_hand_computed():
    """wenc14: m = (a+b)>>1, d = a-b applied H,H then V (ImfWav.cpp
    semantics), hand-checked on one 2x2 block."""
    buf = np.array([[10, 4], [6, 2]], np.uint16)
    _piz._wav2_encode(buf, 100)
    # H pass: rows (10,4)->(7,6), (6,2)->(4,4)
    # V pass on l: (7,4)->(5,3); on h: (6,4)->(5,2)
    np.testing.assert_array_equal(buf, [[5, 5], [3, 2]])
    _piz._wav2_decode(buf, 100)
    np.testing.assert_array_equal(buf, [[10, 4], [6, 2]])


def test_huffman_roundtrip_with_runs():
    rng = np.random.RandomState(1)
    data = np.concatenate([
        rng.randint(0, 2000, 500),
        np.full(1000, 7),  # long run exercises the RLE pseudo-symbol
        rng.randint(0, 65536, 200),
        np.zeros(300, int),
    ]).astype(np.uint16)
    blob = _piz.huf_compress(data)
    back = _piz.huf_uncompress(blob, data.size)
    np.testing.assert_array_equal(back, data)
    # The run-heavy payload must actually compress.
    assert len(blob) < data.size * 2


def test_huffman_single_symbol():
    data = np.full(100, 42, np.uint16)
    back = _piz.huf_uncompress(_piz.huf_compress(data), 100)
    np.testing.assert_array_equal(back, data)


def test_huffman_table_pack_unpack():
    rng = np.random.RandomState(2)
    freq = np.zeros(_piz.HUF_ENCSIZE, np.int64)
    syms = rng.choice(5000, 40, replace=False)
    freq[syms] = rng.randint(1, 1000, 40)
    codes, i_min, i_max = _piz._huf_build_enc_table(freq)
    table = _piz._huf_pack_enc_table(codes, i_min, i_max)
    codes2, _ = _piz._huf_unpack_enc_table(table, 0, i_min, i_max)
    np.testing.assert_array_equal(codes, codes2)


# ---------------------------------------------------------------------------
# Whole-file round-trips


@pytest.mark.parametrize("shape,half", [
    ((8, 8, 3), False),
    ((33, 17, 4), True),   # partial final 32-line PIZ chunk
    ((64, 31, 4), False),
    ((1, 1, 3), False),
])
def test_piz_file_roundtrip(tmp_path, shape, half):
    rng = np.random.RandomState(0)
    img = rng.rand(*shape).astype(np.float32)
    path = str(tmp_path / "img.exr")
    exr.write_pixels(path, img, compression=exr.COMPRESSION_PIZ,
                     half_precision=half)
    back, header = exr.read_pixels(path)
    assert header["compression"] == exr.COMPRESSION_PIZ
    ref = img.astype(np.float16).astype(np.float32) if half else img
    np.testing.assert_array_equal(back[..., : shape[2]], ref)


def test_piz_compresses_smooth_data(tmp_path):
    """A smooth gradient (the ST-map use case) must compress well."""
    h, w = 128, 128
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([xx / w, yy / h, np.zeros_like(xx)], axis=-1)
    path = str(tmp_path / "grad.exr")
    exr.write_pixels(path, img, compression=exr.COMPRESSION_PIZ,
                     half_precision=True)
    import os
    raw_size = h * w * 3 * 2
    assert os.path.getsize(path) < raw_size * 0.6
    back, _ = exr.read_pixels(path)
    np.testing.assert_array_equal(
        back[..., :3], img.astype(np.float16).astype(np.float32)
    )


@pytest.mark.parametrize("compression", [
    exr.COMPRESSION_NONE, exr.COMPRESSION_ZIP, exr.COMPRESSION_PIZ,
])
def test_tiled_roundtrip(tmp_path, compression):
    rng = np.random.RandomState(5)
    img = rng.rand(70, 50, 4).astype(np.float32)
    path = str(tmp_path / "tiled.exr")
    exr.write_pixels_tiled(path, img, tile_size=(32, 16),
                           compression=compression)
    back, header = exr.read_pixels(path)
    assert header["tiled"]
    assert header["tiles"]["x_size"] == 32
    assert header["tiles"]["y_size"] == 16
    np.testing.assert_array_equal(back, img)


def test_multipart_roundtrip_and_selection(tmp_path):
    rng = np.random.RandomState(6)
    beauty = rng.rand(20, 30, 3).astype(np.float32)
    depth = rng.rand(40, 10, 4).astype(np.float32)
    path = str(tmp_path / "mp.exr")
    exr.write_pixels_multipart(
        path, [("beauty", beauty), ("depth", depth)]
    )
    img0, h0 = exr.read_pixels(path)  # default: first part
    assert h0["name"] == "beauty"
    np.testing.assert_array_equal(img0[..., :3], beauty)
    img1, h1 = exr.read_pixels(path, part="depth")
    assert h1["name"] == "depth"
    np.testing.assert_array_equal(img1, depth)
    img1b, _ = exr.read_pixels(path, part=1)
    np.testing.assert_array_equal(img1b, depth)
    with pytest.raises(exr.ExrError):
        exr.read_pixels(path, part="nope")


def _native_or_skip():
    from mayamatchmovesolver_tpu import native

    if not native.has_huffman():
        pytest.skip("native library unavailable")
    return native


def test_native_huffman_bit_identical_to_python():
    """The C++ codec must be BIT-identical to the Python one (same
    canonical table construction and heap tie-breaking), and each must
    decode the other's output."""
    native = _native_or_skip()
    rng = np.random.RandomState(0)
    cases = [
        rng.randint(0, 2000, 5000).astype(np.uint16),
        np.full(3000, 7, np.uint16),
        np.concatenate([
            rng.randint(0, 65536, 300), np.zeros(700, int)
        ]).astype(np.uint16),
        np.array([65535], np.uint16),
    ]
    for data in cases:
        py_blob = _piz.huf_compress(data, use_native=False)
        nat_blob = native.huf_compress(data)
        assert py_blob == nat_blob
        np.testing.assert_array_equal(
            _piz.huf_uncompress(nat_blob, data.size, use_native=False),
            data,
        )
        np.testing.assert_array_equal(
            native.huf_uncompress(py_blob, data.size), data
        )


def test_native_huffman_rejects_corrupt_blob():
    native = _native_or_skip()
    data = np.arange(100, dtype=np.uint16)
    blob = bytearray(native.huf_compress(data))
    blob[8] = 0xFF  # corrupt tableLength region
    blob = blob[:15]  # truncate
    with pytest.raises(_piz.PizError):
        _piz.huf_uncompress(bytes(blob), 100)


def test_piz_chunk_layout_is_spec_shaped(tmp_path):
    """Structural check of the PIZ payload: u16 minNonZero/maxNonZero,
    bitmap slice, i32 huffman length, huffman blob with the 20-byte
    [im, iM, tableLength, nBits, 0] header."""
    import struct

    rng = np.random.RandomState(7)
    img = rng.rand(16, 16, 3).astype(np.float32)
    raw_block = exr._block_bytes(img, 0, 16, 0, 16, ["R", "G", "B"],
                                 np.float32)
    channels = [{"name": n, "type": exr._FLOAT} for n in "BGR"[::-1]]
    payload = _piz.piz_compress(raw_block, channels, 16, 16,
                                exr._TYPE_SIZE)
    min_nz, max_nz = struct.unpack_from("<HH", payload, 0)
    assert 0 <= min_nz <= max_nz < _piz.BITMAP_SIZE
    pos = 4 + (max_nz - min_nz + 1)
    (huf_len,) = struct.unpack_from("<i", payload, pos)
    assert pos + 4 + huf_len == len(payload)
    im, iM, table_len, nbits, future = struct.unpack_from(
        "<5I", payload, pos + 4
    )
    assert future == 0
    assert im <= iM < _piz.HUF_ENCSIZE
    assert 20 + table_len + (nbits + 7) // 8 == huf_len
    # And it inverts.
    back = _piz.piz_uncompress(payload, channels, 16, 16,
                               exr._TYPE_SIZE)
    assert back == raw_block


# ---------------------------------------------------------------------------
# Real-world ground truth: a file produced by the actual OpenEXR tools.
# tests/data/python_logo_openexr.exr is the 16x16 half-RGBA Python-logo
# sample image shipped with CPython's test suite (Lib/test/imghdrdata/
# python.exr, PSF-licensed test data) — written by the real OpenEXR
# library, NOT by this repo's writer.  No OpenEXR binding exists in
# this environment, so PIZ chunks themselves cannot be cross-validated
# against the C++ library here (the codec is instead validated
# bit-exactly against the independent native/ C++ implementation in
# the tests above); this fixture at least pins the container layout
# (header, chlist, scanline offsets, half-float decoding) to a
# third-party-produced file.
# ---------------------------------------------------------------------------

_REAL_EXR = os.path.join(
    os.path.dirname(__file__), "..", "data", "python_logo_openexr.exr"
)


def test_reads_real_openexr_file():
    img, header = exr.read_pixels(_REAL_EXR)
    assert img.shape == (16, 16, 4)
    assert header["compression"] == exr.COMPRESSION_NONE
    # Half-float data decoded into [0, 1] logo colors.
    assert float(img.min()) >= 0.0 and float(img.max()) <= 1.0
    # The logo has structure: not constant.
    assert float(img.std()) > 0.05


def test_piz_transcode_of_real_file_roundtrips():
    """Re-encode the real OpenEXR image through our PIZ writer and
    decode it back: pixels must be bit-identical (half stays half)."""
    import tempfile

    img, _ = exr.read_pixels(_REAL_EXR)
    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, "piz.exr")
        exr.write_pixels(out, img, compression=exr.COMPRESSION_PIZ,
                         half_precision=True)
        back, header = exr.read_pixels(out)
    assert header["compression"] == exr.COMPRESSION_PIZ
    np.testing.assert_array_equal(
        np.asarray(img, np.float16), np.asarray(back, np.float16)
    )
