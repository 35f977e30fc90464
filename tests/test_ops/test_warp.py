"""Image warp (ST-map resample) tests: identity map round-trip,
distort/undistort near-inverse on real pixel data, warp-vs-oracle.
(The reference produces ST maps for compositor STMap nodes to consume;
ops/warp.py is that consumer, natively.)"""

import numpy as np

from mayamatchmovesolver_tpu import models
from mayamatchmovesolver_tpu.ops import stmap as stmap_mod
from mayamatchmovesolver_tpu.ops import warp as warp_mod


def _test_image(h=48, w=64):
    yy, xx = np.mgrid[0:h, 0:w]
    r = np.sin(xx * 0.3) * 0.5 + 0.5
    g = np.cos(yy * 0.2) * 0.5 + 0.5
    b = ((xx + yy) % 7) / 7.0
    return np.stack([r, g, b], axis=-1).astype(np.float32)


def test_identity_stmap_is_identity():
    img = _test_image()
    h, w = img.shape[:2]
    yy, xx = np.mgrid[0:h, 0:w]
    st = np.stack(
        [(xx + 0.5) / w, 1.0 - (yy + 0.5) / h], axis=-1
    ).astype(np.float32)
    out = np.asarray(warp_mod.warp_image(img, st))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_warp_matches_manual_bilinear():
    """A constant-offset ST map: compare against a manual shift."""
    img = _test_image()
    h, w = img.shape[:2]
    yy, xx = np.mgrid[0:h, 0:w]
    # Source = destination shifted by exactly 2 pixels right.
    st = np.stack(
        [(xx + 2 + 0.5) / w, 1.0 - (yy + 0.5) / h], axis=-1
    ).astype(np.float32)
    out = np.asarray(warp_mod.warp_image(img, st))
    np.testing.assert_allclose(
        out[:, : w - 2], img[:, 2:], atol=1e-5
    )


def test_lens_warp_roundtrip_recovers_interior():
    """distort then undistort through the same lens is near-identity
    away from the frame edge (bilinear resampling + edge clamp make
    the border lossy, like any compositor warp)."""
    img = _test_image(64, 96)
    model = models.TdeClassic.create(distortion=0.08)
    fb = models.FilmBack.create(width_cm=3.6, height_cm=2.4)
    distorted = np.asarray(
        warp_mod.warp_image_with_lens(img, model, fb, "undistort")
    )
    back = np.asarray(
        warp_mod.warp_image_with_lens(distorted, model, fb, "distort")
    )
    h, w = img.shape[:2]
    m = 12  # interior margin
    err = np.abs(back[m:-m, m:-m] - img[m:-m, m:-m])
    assert float(np.median(err)) < 0.04, float(np.median(err))


def test_warp_consumes_framework_stmaps():
    """The maps ops/stmap.py generates are directly consumable."""
    img = _test_image(32, 48)
    model = models.TdeClassic.create(distortion=0.1)
    fb = models.FilmBack.create(width_cm=3.6, height_cm=2.4)
    st = stmap_mod.stmap_xla(model, fb, 48, 32, "distort")
    out = np.asarray(warp_mod.warp_image(img, st))
    assert out.shape == img.shape
    assert np.isfinite(out).all()
    # Spot-check: the output equals a manual bilinear sample at the ST
    # map's UV for an interior pixel.
    st_np = np.asarray(st)
    u, v = st_np[16, 24, 0], st_np[16, 24, 1]
    oracle = np.asarray(
        warp_mod._bilinear_sample(
            np.asarray(img), np.asarray(u), np.asarray(v)
        )
    )
    np.testing.assert_allclose(out[16, 24], oracle, atol=1e-6)
