"""Line math + batch reprojection + triangulation tests."""

import jax.numpy as jnp
import numpy as np

from mayamatchmovesolver_tpu.core import line as line_mod
from mayamatchmovesolver_tpu.utils import reproject as rp


def test_fit_line_to_points():
    t = np.linspace(0, 1, 20)
    x = 1.0 + 2.0 * t
    y = -0.5 + 1.0 * t
    px, py, dx, dy = line_mod.fit_line_to_points(
        jnp.asarray(x), jnp.asarray(y)
    )
    slope = float(dy) / float(dx)
    np.testing.assert_allclose(slope, 0.5, atol=1e-9)
    # Centroid lies on the line.
    np.testing.assert_allclose(float(px), x.mean(), atol=1e-12)


def test_line_point_intersection():
    p = line_mod.line_point_intersection(
        jnp.asarray([1.0, 1.0]),
        jnp.asarray([0.0, 0.0]),
        jnp.asarray([2.0, 0.0]),
    )
    np.testing.assert_allclose(np.asarray(p), [1.0, 0.0], atol=1e-12)


def test_line_line_intersection():
    p, parallel = line_mod.line_line_intersection(
        jnp.asarray([0.0, 0.0]), jnp.asarray([1.0, 1.0]),
        jnp.asarray([2.0, 0.0]), jnp.asarray([0.0, 1.0]),
    )
    np.testing.assert_allclose(np.asarray(p), [2.0, 2.0], atol=1e-12)
    assert not bool(parallel)
    _, parallel = line_mod.line_line_intersection(
        jnp.asarray([0.0, 0.0]), jnp.asarray([1.0, 0.0]),
        jnp.asarray([0.0, 1.0]), jnp.asarray([2.0, 0.0]),
    )
    assert bool(parallel)


def test_reproject_matches_scene_engine():
    """utils.reproject must agree with the scene evaluator."""
    from mayamatchmovesolver_tpu.core.constants import FilmFit
    from mayamatchmovesolver_tpu.scene import SceneGraph, evaluate

    sg = SceneGraph(frame_range=(1, 1))
    cam = sg.create_camera(
        "cam", tx=1.0, ty=0.5, tz=9.0, ry=12.0,
        film_fit=FilmFit.HORIZONTAL,
        render_width=1920, render_height=1080,
    )
    bnd = sg.create_bundle("b", tx=0.4, ty=-0.2, tz=-4.0)
    sg.create_marker("m", camera=cam, bundle=bnd)
    scene, attrs = sg.bake()
    ev = evaluate(scene, attrs, jnp.asarray([0]))

    cam_world = rp.camera_world_matrix_from_trs(1.0, 0.5, 9.0,
                                                0.0, 12.0, 0.0)
    xy = rp.reproject_points(
        jnp.asarray([0.4, -0.2, -4.0]), cam_world,
        render_width=1920, render_height=1080,
        film_fit=FilmFit.HORIZONTAL,
    )
    np.testing.assert_allclose(
        np.asarray(xy), np.asarray(ev.point_xy[0, 0]), atol=1e-12
    )
    px = rp.reproject_points(
        jnp.asarray([0.4, -0.2, -4.0]), cam_world,
        render_width=1920, render_height=1080,
        film_fit=FilmFit.HORIZONTAL, as_pixels=True,
    )
    np.testing.assert_allclose(
        np.asarray(px),
        (np.asarray(ev.point_xy[0, 0]) + 0.5) * [1920, 1080],
        atol=1e-9,
    )


def test_triangulate_markers_recovers_bundles():
    from mayamatchmovesolver_tpu.core.constants import FilmFit
    from mayamatchmovesolver_tpu.scene import SceneGraph, evaluate
    from mayamatchmovesolver_tpu.solver import triangulate

    n = 6
    sg = SceneGraph(frame_range=(1, n))
    cam = sg.create_camera(
        "cam", tx=np.linspace(-2, 2, n), tz=8.0,
        ry=np.linspace(-10, 10, n),
        film_fit=FilmFit.HORIZONTAL,
        render_width=1920, render_height=1080,
    )
    truth = [(0.5, 0.3, -4.0), (-1.0, 0.8, -6.0), (2.0, -0.5, -5.0)]
    for i, (x, y, z) in enumerate(truth):
        b = sg.create_bundle("b%d" % i, tx=x, ty=y, tz=z)
        sg.create_marker("m%d" % i, camera=cam, bundle=b,
                         tx=np.zeros(n), ty=np.zeros(n))
    scene, attrs = sg.bake()
    ev = evaluate(scene, attrs, jnp.arange(n))
    # Raw marker attrs live in pre-film-fit space; invert the fit scale.
    from mayamatchmovesolver_tpu.scene.flatscene import (
        set_marker_screen_positions,
    )

    attrs = set_marker_screen_positions(
        scene, attrs, jnp.arange(n), ev.point_xy
    )

    points, ok = triangulate.triangulate_markers(
        scene, attrs, jnp.arange(n)
    )
    assert np.asarray(ok).all()
    np.testing.assert_allclose(
        np.asarray(points), np.asarray(truth), atol=1e-6
    )
