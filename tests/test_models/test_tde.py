"""Lens model tests: NumPy oracles for the published formulas +
distort/undistort round trips (the reference's own correctness invariant;
the ldpk inverse terminates when |f(p) - q| < 1e-6)."""

import jax.numpy as jnp
import numpy as np

from mayamatchmovesolver_tpu import models


def _grid():
    xs = np.linspace(-0.6, 0.6, 5)
    g = np.stack(np.meshgrid(xs, xs), axis=-1).reshape(-1, 2)
    return jnp.asarray(g)


def test_classic_undistort_oracle():
    p = models.TdeClassic.create(
        distortion=0.1, anamorphic_squeeze=1.1, curvature_x=0.05,
        curvature_y=-0.03, quartic_distortion=0.02,
    )
    pts = _grid()
    got = np.asarray(models.undistort_dn(p, pts))

    ld, sq, cx, cy, qu = 0.1, 1.1, 0.05, -0.03, 0.02
    x, y = np.asarray(pts[:, 0]), np.asarray(pts[:, 1])
    x2, y2 = x * x, y * y
    want_x = x * (
        1 + (ld / sq) * x2 + ((ld + cx) / sq) * y2 + (qu / sq) * x2 * x2
        + (2 * qu / sq) * x2 * y2 + (qu / sq) * y2 * y2
    )
    want_y = y * (
        1 + (ld + cy) * x2 + ld * y2 + qu * x2 * x2
        + 2 * qu * x2 * y2 + qu * y2 * y2
    )
    np.testing.assert_allclose(got[:, 0], want_x, atol=1e-12)
    np.testing.assert_allclose(got[:, 1], want_y, atol=1e-12)


def test_radial_deg4_round_trip():
    p = models.TdeRadialStdDeg4.create(
        degree2_distortion=0.08, degree2_u=0.01, degree2_v=-0.02,
        degree4_distortion=-0.03, degree4_u=0.004, degree4_v=0.002,
        cylindric_direction=15.0, cylindric_bending=0.05,
    )
    pts = _grid() * 0.8
    distorted = models.distort_dn(p, pts)
    back = models.undistort_dn(p, distorted)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-9)


def test_classic_round_trip():
    p = models.TdeClassic.create(distortion=0.15, anamorphic_squeeze=1.05,
                                 curvature_x=0.02, curvature_y=0.01,
                                 quartic_distortion=-0.05)
    pts = _grid() * 0.7
    d = models.distort_dn(p, pts)
    u = models.undistort_dn(p, d)
    np.testing.assert_allclose(np.asarray(u), np.asarray(pts), atol=1e-9)


def test_anamorphic_round_trip_and_rotation():
    fb = models.FilmBack.create(pixel_aspect=2.0)
    p = models.TdeAnamorphicStdDeg4.create(
        degree2_cx02=0.05, degree2_cy02=-0.04, degree2_cx22=0.02,
        degree2_cy22=0.01, degree4_cx04=-0.01, degree4_cy04=0.005,
        degree4_cx24=0.002, degree4_cy24=-0.003, degree4_cx44=0.001,
        degree4_cy44=0.001, lens_rotation=10.0, squeeze_x=1.1,
        squeeze_y=0.95,
    )
    pts = _grid() * 0.5
    d = models.distort_dn(p, pts, fb)
    u = models.undistort_dn(p, d, fb)
    np.testing.assert_allclose(np.asarray(u), np.asarray(pts), atol=1e-8)


def test_anamorphic_rescaled_reduces_to_base_when_one():
    fb = models.FilmBack.create()
    base_p = models.TdeAnamorphicStdDeg4.create(degree2_cx02=0.05,
                                                degree2_cy02=0.03)
    resc_p = models.TdeAnamorphicStdDeg4Rescaled.create(
        degree2_cx02=0.05, degree2_cy02=0.03, rescale=1.0
    )
    pts = _grid() * 0.5
    np.testing.assert_allclose(
        np.asarray(models.undistort_dn(base_p, pts, fb)),
        np.asarray(models.undistort_dn(resc_p, pts, fb)),
        atol=1e-12,
    )


def test_passthrough_identity_marker_space():
    fb = models.FilmBack.create()
    pts = _grid() * 0.4
    np.testing.assert_allclose(
        np.asarray(models.distort(models.Passthrough(), fb, pts)),
        np.asarray(pts),
        atol=1e-12,
    )


def test_marker_space_round_trip_with_lens_offset():
    fb = models.FilmBack.create(width_cm=3.6, height_cm=2.4,
                                offset_x_cm=0.1, offset_y_cm=-0.05)
    p = models.TdeClassic.create(distortion=0.12)
    pts = _grid() * 0.4
    d = models.distort(p, fb, pts)
    u = models.undistort(p, fb, d)
    np.testing.assert_allclose(np.asarray(u), np.asarray(pts), atol=1e-9)


def test_distortion_is_differentiable():
    import jax

    fb = models.FilmBack.create()

    def f(k1):
        p = models.TdeClassic.create(distortion=k1)
        out = models.distort(p, fb, jnp.asarray([0.3, 0.2]))
        return jnp.sum(out)

    g = jax.grad(f)(jnp.asarray(0.1))
    assert np.isfinite(float(g))
    assert abs(float(g)) > 1e-6
