"""Camera projection parity tests.

The expected values are from the reference's own unit test
(ref: lib/rust/mmscenegraph/src/math/camera.rs:78-120).
"""

import numpy as np

from mayamatchmovesolver_tpu.core import camera as cam
from mayamatchmovesolver_tpu.core.constants import FilmFit


def test_angle_of_view_degrees():
    # (ref: math/camera.rs:70-76).
    aov = np.degrees(float(cam.angle_of_view_radians(36.0, 35.0)))
    np.testing.assert_allclose(aov, 54.432228, atol=1e-5)


def test_projection_matrix_reference_values():
    # (ref: math/camera.rs:79-120) — focal 35mm, film back 36x24mm,
    # image 2048x1556, horizontal fit, near 0.1cm, far 10000cm.
    got = np.asarray(
        cam.projection_matrix(
            35.0,
            36.0 / 25.4,
            24.0 / 25.4,
            0.0,
            0.0,
            2048.0,
            1556.0,
            FilmFit.HORIZONTAL,
            0.1,
            10000.0,
            1.0,
        )
    )
    want = np.array(
        [
            [1.94445, 0.0, 0.0, 0.0],
            [0.0, 2.55927, 0.0, 0.0],
            [0.0, 0.0, 1.00002, 0.200002],
            [0.0, 0.0, -1.0, 0.0],
        ]
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_projection_matrix_batched_film_fits():
    fits = np.array([0, 1, 2, 3])
    got = cam.projection_matrix(
        35.0,
        np.full((4,), 36.0 / 25.4),
        24.0 / 25.4,
        0.0,
        0.0,
        2048.0,
        1556.0,
        fits,
        0.1,
        10000.0,
        1.0,
    )
    assert got.shape == (4, 4, 4)
    for i, fit in enumerate(fits):
        single = cam.projection_matrix(
            35.0, 36.0 / 25.4, 24.0 / 25.4, 0.0, 0.0,
            2048.0, 1556.0, int(fit), 0.1, 10000.0, 1.0,
        )
        np.testing.assert_allclose(
            np.asarray(got[i]), np.asarray(single), atol=1e-12
        )


def test_film_fit_scale_consistency_with_projection():
    """For every fit mode, marker scaling must compensate the projection's
    film-fit factors: a point whose *unfitted* projection is (u, v) and a
    marker at (u, v) must agree after both corrections.

    This is the invariant the reference maintains between
    scale_xy_with_film_fit (flat.rs:73-97) and the projection matrix.
    """
    film_aspect = (36.0 / 25.4) / (24.0 / 25.4)
    render_aspect = 2048.0 / 1556.0
    for fit in range(4):
        # Projection with fit mode vs FILL-free comparison via ratios of
        # the diagonal terms.
        m_fit = np.asarray(
            cam.projection_matrix(
                35.0, 36.0 / 25.4, 24.0 / 25.4, 0.0, 0.0,
                2048.0, 1556.0, fit, 0.1, 10000.0, 1.0,
            )
        )
        sx, sy = cam.marker_film_fit_scale(fit, film_aspect, render_aspect)
        # HORIZONTAL is the reference gauge: its x scale equals the film
        # gate; verify each mode's diagonal relates to HORIZONTAL's by the
        # same ratio the marker scale applies.
        m_h = np.asarray(
            cam.projection_matrix(
                35.0, 36.0 / 25.4, 24.0 / 25.4, 0.0, 0.0,
                2048.0, 1556.0, 1, 0.1, 10000.0, 1.0,
            )
        )
        ratio_x = m_fit[0, 0] / m_h[0, 0]
        ratio_y = m_fit[1, 1] / m_h[1, 1]
        sx_h, sy_h = cam.marker_film_fit_scale(1, film_aspect, render_aspect)
        np.testing.assert_allclose(
            float(sx) / float(sx_h), ratio_x, atol=1e-9,
            err_msg="fit=%d x" % fit,
        )
        np.testing.assert_allclose(
            float(sy) / float(sy_h), ratio_y, atol=1e-9,
            err_msg="fit=%d y" % fit,
        )
