"""EXR + image utility tests (host-side)."""

import os

import numpy as np

from mayamatchmovesolver_tpu.io import exr, image


def test_exr_round_trip_all_compressions(tmp_path):
    img = np.random.RandomState(0).rand(33, 47, 4).astype(np.float32)
    for comp in (exr.COMPRESSION_NONE, exr.COMPRESSION_ZIPS,
                 exr.COMPRESSION_ZIP, exr.COMPRESSION_RLE):
        path = os.path.join(tmp_path, "t%d.exr" % comp)
        exr.write_pixels(path, img, compression=comp)
        back, header = exr.read_pixels(path)
        np.testing.assert_array_equal(back, img)
        assert header["compression"] == comp


def test_exr_rle_compresses_flat_image(tmp_path):
    # A constant image must actually shrink through the RLE path (the
    # raw-fallback branch would hide an encoder that never fires).
    img = np.full((64, 64, 4), 0.25, np.float32)
    path_rle = os.path.join(tmp_path, "rle.exr")
    path_none = os.path.join(tmp_path, "none.exr")
    exr.write_pixels(path_rle, img, compression=exr.COMPRESSION_RLE)
    exr.write_pixels(path_none, img, compression=exr.COMPRESSION_NONE)
    # Float32 constant pixels RLE to ~2:1 (the predictor's interleaved
    # second half alternates two byte values — same ratio as OpenEXR).
    assert os.path.getsize(path_rle) < os.path.getsize(path_none) / 1.8
    back, _ = exr.read_pixels(path_rle)
    np.testing.assert_array_equal(back, img)


def test_exr_rle_record_decoder():
    # Hand-built RLE record stream (ImfRle.cpp semantics): a run record
    # (count=2 -> three 0x07 bytes) then a literal record (-2 -> two
    # literal bytes).
    raw = bytes([2, 7, 256 - 2, 9, 5])
    assert exr._rle_uncompress(raw, 5) == bytes([7, 7, 7, 9, 5])
    # Encoder round-trip through the full predictor+RLE transform.
    data = bytes([1, 1, 1, 1, 9, 8, 7, 7, 7, 7, 7, 2]) * 11
    enc = exr._rle_encode(data)
    assert exr._rle_decode(enc, len(data)) == data


def test_exr_half_precision(tmp_path):
    img = np.random.RandomState(1).rand(8, 8, 3).astype(np.float32)
    path = os.path.join(tmp_path, "h.exr")
    exr.write_pixels(path, img, half_precision=True)
    back, _ = exr.read_pixels(path)
    np.testing.assert_allclose(back[..., :3], img, atol=1e-3)
    np.testing.assert_allclose(back[..., 3], 1.0)  # alpha fill


def test_exr_metadata_round_trip(tmp_path):
    img = np.zeros((4, 4, 4), np.float32)
    path = os.path.join(tmp_path, "m.exr")
    exr.write_pixels(
        path, img,
        extra_attributes={"owner": ("string", b"mmtpu")},
    )
    header = exr.read_header(path)
    assert header["_attrs"]["owner"] == ("string", b"mmtpu")


def test_image_size_and_convert(tmp_path):
    img = np.random.RandomState(2).rand(20, 30, 4).astype(np.float32)
    src = os.path.join(tmp_path, "a.exr")
    dst = os.path.join(tmp_path, "b.exr")
    exr.write_pixels(src, img)
    assert image.image_size(src) == (30, 20)
    w, h = image.convert_image(src, dst, scale=0.5)
    assert (w, h) == (15, 10)
    back, _ = image.read_image(dst)
    assert back.shape == (10, 15, 4)
    # Down-then-check average brightness is preserved.
    np.testing.assert_allclose(back.mean(), img.mean(), atol=0.02)


def test_resize_identity():
    img = np.random.RandomState(3).rand(7, 9, 4).astype(np.float32)
    out = image.resize_image(img, 9, 7)
    np.testing.assert_allclose(out, img, atol=1e-6)
