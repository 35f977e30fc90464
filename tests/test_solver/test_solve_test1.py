"""Milestone-1 end-to-end solve: the reference's test_solver/test1.py
scenario (ref: tests/test/test_solver/test1.py:44-122).

Static camera at (-1, 1, -5); bundle starts at (5.5, 6.4, -25); a single
marker observed at the screen position of ground truth (-6.0, 3.6, -25);
solving bundle tx/ty must recover (-6.0, 3.6).
"""

import jax.numpy as jnp
import numpy as np

from mayamatchmovesolver_tpu.core.constants import FilmFit
from mayamatchmovesolver_tpu.scene import SceneGraph, evaluate
from mayamatchmovesolver_tpu.solver import SolverOptions, solve


def _build_scene(bundle_tx, bundle_ty, marker_xy):
    sg = SceneGraph(frame_range=(1, 1))
    cam = sg.create_camera(
        "cam",
        tx=-1.0,
        ty=1.0,
        tz=-5.0,
        focal_length_mm=35.0,
        sensor_width_mm=36.0,
        sensor_height_mm=24.0,
        film_fit=FilmFit.HORIZONTAL,
        # Render aspect == film aspect so screen coords match the
        # reference test's marker numbers exactly.
        render_width=1500,
        render_height=1000,
    )
    bnd = sg.create_bundle("bundle", tx=bundle_tx, ty=bundle_ty, tz=-25.0)
    sg.create_marker(
        "marker", camera=cam, bundle=bnd, tx=marker_xy[0], ty=marker_xy[1]
    )
    return sg, cam, bnd


def test_marker_position_matches_reference_numbers():
    """Ground-truth bundle at (-6, 3.6, -25) seen from (-1, 1, -5) is at
    screen (-0.243056042, 0.189583713)
    (ref: tests/test/test_solver/test1.py:64-65)."""
    sg, _, _ = _build_scene(-6.0, 3.6, (0.0, 0.0))
    scene, attrs = sg.bake()
    out = evaluate(scene, attrs, jnp.asarray([0]))
    # The reference's hard-coded numbers carry Maya's rounded film
    # aperture storage (~5e-7 off the exact 36mm math); 1e-6 here is
    # 0.0015 px at 1500 px image width.
    np.testing.assert_allclose(
        np.asarray(out.point_xy[0, 0]),
        [-0.243056042, 0.189583713],
        atol=1e-6,
    )


def test_solve_bundle_tx_ty():
    sg, cam, bnd = _build_scene(5.5, 6.4, (-0.243056042, 0.189583713))
    scene, attrs = sg.bake()

    options = SolverOptions(iterations=100, image_width=1500.0)
    new_attrs, result = solve(
        scene,
        attrs,
        [0],
        [bnd.attr("tx"), bnd.attr("ty")],
        options,
    )
    assert result.success, result.reason_string

    tx = float(new_attrs.static_values[bnd.attr("tx").code // 2])
    ty = float(new_attrs.static_values[bnd.attr("ty").code // 2])
    # (ref: test1.py:117-121 assertApproxEqual default tolerance ~1e-4.)
    np.testing.assert_allclose(tx, -6.0, atol=1e-4)
    np.testing.assert_allclose(ty, 3.6, atol=1e-4)
    assert result.error_final < 1e-3  # pixels
    assert result.error_final < result.error_initial
