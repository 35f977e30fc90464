"""Native C++ engine vs the JAX implementation — cross-implementation
agreement, the pattern of the reference's MayaDAG/MMSceneGraph matrix."""

import numpy as np
import pytest

from mayamatchmovesolver_tpu import models, native
import mayamatchmovesolver_tpu.ops.stmap as stmap_mod

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def test_native_stmap_matches_xla():
    lens = (0.12, 1.05, 0.03, -0.02, 0.01)
    fb = models.FilmBack.create(width_cm=3.6, height_cm=2.4)
    model = models.TdeClassic.create(
        distortion=lens[0], anamorphic_squeeze=lens[1],
        curvature_x=lens[2], curvature_y=lens[3],
        quartic_distortion=lens[4],
    )
    for direction in ("distort", "undistort"):
        fast = native.stmap_classic(
            lens, (3.6, 2.4, 0.0, 0.0, 1.0), 80, 50, direction
        )
        oracle = np.asarray(
            stmap_mod.stmap_xla(model, fb, 80, 50, direction)
        )
        np.testing.assert_allclose(
            fast[..., :2], oracle[..., :2], atol=2e-5, err_msg=direction
        )


def test_native_anamorphic_matches_jax():
    params = (0.03, 0.02, 0.01, -0.015, 0.004, -0.003, 0.002, 0.001,
              -0.0005, 0.0008, 4.0, 1.1, 0.95)
    fb = models.FilmBack.create(width_cm=3.6, height_cm=2.4)
    model = models.TdeAnamorphicStdDeg4.create(
        degree2_cx02=params[0], degree2_cy02=params[1],
        degree2_cx22=params[2], degree2_cy22=params[3],
        degree4_cx04=params[4], degree4_cy04=params[5],
        degree4_cx24=params[6], degree4_cy24=params[7],
        degree4_cx44=params[8], degree4_cy44=params[9],
        lens_rotation=params[10], squeeze_x=params[11],
        squeeze_y=params[12],
    )
    for direction in ("distort", "undistort"):
        fast = native.stmap_anamorphic_deg4(
            params, (3.6, 2.4, 0.0, 0.0, 1.0), 64, 40, direction
        )
        oracle = np.asarray(
            stmap_mod.stmap_xla(model, fb, 64, 40, direction)
        )
        np.testing.assert_allclose(
            fast[..., :2], oracle[..., :2], atol=2e-5, err_msg=direction
        )


def test_native_anamorphic_rescaled_matches_jax():
    params = (0.02, 0.015, 0.005, -0.01, 0.002, -0.001, 0.001, 0.0005,
              -0.0002, 0.0004, -3.0, 1.05, 0.98, 1.15)
    fb = models.FilmBack.create(width_cm=3.6, height_cm=2.4)
    model = models.TdeAnamorphicStdDeg4Rescaled.create(
        degree2_cx02=params[0], degree2_cy02=params[1],
        degree2_cx22=params[2], degree2_cy22=params[3],
        degree4_cx04=params[4], degree4_cy04=params[5],
        degree4_cx24=params[6], degree4_cy24=params[7],
        degree4_cx44=params[8], degree4_cy44=params[9],
        lens_rotation=params[10], squeeze_x=params[11],
        squeeze_y=params[12], rescale=params[13],
    )
    fast = native.stmap_anamorphic_deg4(
        params, (3.6, 2.4, 0.0, 0.0, 1.0), 48, 32, "undistort"
    )
    oracle = np.asarray(
        stmap_mod.stmap_xla(model, fb, 48, 32, "undistort")
    )
    np.testing.assert_allclose(
        fast[..., :2], oracle[..., :2], atol=2e-5
    )


def test_native_exr_readable_by_python_reader():
    from mayamatchmovesolver_tpu.io import exr

    img = np.random.RandomState(0).rand(21, 33, 4).astype(np.float32)
    native.exr_write_rgba("/tmp/mmtpu_native_test.exr", img)
    back, header = exr.read_pixels("/tmp/mmtpu_native_test.exr")
    np.testing.assert_allclose(back, img, atol=0)
    assert header["compression"] == exr.COMPRESSION_NONE


def test_native_radial_matches_jax():
    params = (0.08, 0.01, -0.02, -0.03, 0.004, 0.002, 15.0, 0.05)
    fb = models.FilmBack.create()
    model = models.TdeRadialStdDeg4.create(
        degree2_distortion=params[0], degree2_u=params[1],
        degree2_v=params[2], degree4_distortion=params[3],
        degree4_u=params[4], degree4_v=params[5],
        cylindric_direction=params[6], cylindric_bending=params[7],
    )
    fast = native.stmap_radial_deg4(
        params, (3.6, 2.4, 0.0, 0.0, 1.0), 64, 40, "undistort"
    )
    oracle = np.asarray(
        stmap_mod.stmap_xla(model, fb, 64, 40, "undistort")
    )
    np.testing.assert_allclose(
        fast[..., :2], oracle[..., :2], atol=2e-5
    )
