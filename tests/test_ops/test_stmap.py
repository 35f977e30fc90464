"""ST-map kernel tests: Pallas fast path vs XLA oracle — the analogue
of the reference's backend-agreement matrix applied to the image path
(ref: distortion kernels, lib/cppbind/mmlens/src/distortion_process.rs).
"""

import jax
import numpy as np
import pytest

from mayamatchmovesolver_tpu import models
import mayamatchmovesolver_tpu.ops.stmap as stmap_mod


def _is_tpu():
    return jax.devices()[0].platform == "tpu"


def test_stmap_xla_identity_for_passthrough():
    fb = models.FilmBack.create()
    out = stmap_mod.stmap_xla(
        models.Passthrough(), fb, 64, 32, direction="distort"
    )
    out = np.asarray(out)
    # Identity ST map: pixel centers map to themselves.
    xs = (np.arange(64) + 0.5) / 64
    np.testing.assert_allclose(out[5, :, 0], xs, atol=1e-6)
    assert out.shape == (32, 64, 4)
    np.testing.assert_allclose(out[..., 3], 1.0)


def test_stmap_xla_distort_undistort_inverse():
    fb = models.FilmBack.create()
    model = models.TdeClassic.create(distortion=0.1)
    dist = np.asarray(
        stmap_mod.stmap_xla(model, fb, 32, 24, direction="distort")
    )
    undist = np.asarray(
        stmap_mod.stmap_xla(model, fb, 32, 24, direction="undistort")
    )
    # Distortion moves points opposite to undistortion (to first order
    # around the center).
    center_row = 12
    d = dist[center_row, :, 0] - (np.arange(32) + 0.5) / 32
    u = undist[center_row, :, 0] - (np.arange(32) + 0.5) / 32
    mask = np.abs(d) > 1e-5
    assert np.all(np.sign(d[mask]) == -np.sign(u[mask]))


def _all_models():
    return [
        (
            "classic",
            models.TdeClassic.create(
                distortion=0.15, anamorphic_squeeze=1.05,
                curvature_x=0.02, curvature_y=-0.01,
                quartic_distortion=0.03,
            ),
        ),
        (
            "radial_deg4",
            models.TdeRadialStdDeg4.create(
                degree2_distortion=0.12, degree2_u=0.01, degree2_v=-0.02,
                degree4_distortion=0.04, degree4_u=-0.005,
                degree4_v=0.008, cylindric_direction=25.0,
                cylindric_bending=0.1,
            ),
        ),
        (
            "anamorphic_deg4",
            models.TdeAnamorphicStdDeg4.create(
                degree2_cx02=0.05, degree2_cy02=0.03, degree2_cx22=0.02,
                degree2_cy22=-0.01, degree4_cx04=0.01,
                degree4_cy04=-0.005, degree4_cx24=0.004,
                degree4_cy24=0.002, degree4_cx44=-0.003,
                degree4_cy44=0.001, lens_rotation=4.0, squeeze_x=1.1,
                squeeze_y=0.95,
            ),
        ),
        (
            "anamorphic_deg4_rescaled",
            models.TdeAnamorphicStdDeg4Rescaled.create(
                degree2_cx02=0.05, degree2_cy02=0.03, degree2_cx22=0.02,
                degree2_cy22=-0.01, degree4_cx04=0.01,
                degree4_cy04=-0.005, lens_rotation=-3.0, squeeze_x=1.05,
                squeeze_y=1.0, rescale=1.1,
            ),
        ),
    ]


@pytest.mark.skipif(not _is_tpu(), reason="Pallas TPU kernel needs TPU")
@pytest.mark.parametrize("name,model", _all_models())
def test_stmap_pallas_matches_xla_oracle(name, model):
    """Pallas kernel vs XLA oracle over every 3DE model — the
    backend-agreement matrix of the image path."""
    fb = models.FilmBack.create(
        width_cm=3.6, height_cm=2.4, offset_x_cm=0.05, offset_y_cm=-0.02
    )
    for direction in ("distort", "undistort"):
        fast = np.asarray(
            stmap_mod.stmap_pallas(
                model, fb, 200, 100, direction=direction
            )
        )
        oracle = np.asarray(
            stmap_mod.stmap_xla(model, fb, 200, 100, direction=direction)
        )
        np.testing.assert_allclose(
            fast[..., :2], oracle[..., :2], atol=2e-5,
            err_msg="%s/%s" % (name, direction),
        )
