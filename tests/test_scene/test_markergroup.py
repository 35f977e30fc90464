"""MarkerGroup overscan tests (ref: python/mmSolver/_api/markergroup.py,
src/mmSolver/node/MMMarkerScaleNode.cpp overscan capability)."""

import jax.numpy as jnp
import numpy as np

from mayamatchmovesolver_tpu.scene import SceneGraph, evaluate
from mayamatchmovesolver_tpu.scene.flatscene import (
    set_marker_screen_positions,
)


def _scene(overscan_x=1.2, overscan_y=0.9, n=3):
    sg = SceneGraph(frame_range=(1, n))
    cam = sg.create_camera("cam", tz=10.0, render_width=1920,
                           render_height=1080)
    grp = sg.create_marker_group("grp", camera=cam,
                                 overscan_x=overscan_x,
                                 overscan_y=overscan_y)
    bnd = sg.create_bundle("b", tx=1.0, ty=0.5, tz=-5.0)
    mkr = sg.create_marker("m", camera=cam, bundle=bnd, group=grp,
                           tx=np.full(n, 0.25), ty=np.full(n, -0.1))
    bnd2 = sg.create_bundle("b2", tx=-1.0, tz=-5.0)
    mkr2 = sg.create_marker("m2", camera=cam, bundle=bnd2,
                            tx=np.full(n, 0.25), ty=np.full(n, -0.1))
    return sg, grp, mkr, mkr2


def test_overscan_scales_marker_xy():
    sg, grp, mkr, mkr2 = _scene()
    scene, attrs = sg.bake()
    ev = evaluate(scene, attrs, jnp.arange(3))
    xy = np.asarray(ev.marker_xy)
    # Grouped marker is scaled by overscan relative to ungrouped one.
    np.testing.assert_allclose(xy[0, :, 0], xy[1, :, 0] * 1.2,
                               atol=1e-12)
    np.testing.assert_allclose(xy[0, :, 1], xy[1, :, 1] * 0.9,
                               atol=1e-12)


def test_overscan_shared_and_animatable():
    n = 3
    sg = SceneGraph(frame_range=(1, n))
    cam = sg.create_camera("cam", tz=10.0)
    grp = sg.create_marker_group(
        "grp", camera=cam, overscan_x=np.array([1.0, 1.1, 1.2])
    )
    bnd = sg.create_bundle("b", tz=-5.0)
    m1 = sg.create_marker("m1", camera=cam, bundle=bnd, group=grp,
                          tx=np.full(n, 0.2))
    b2 = sg.create_bundle("b2", tz=-6.0)
    m2 = sg.create_marker("m2", camera=cam, bundle=b2, group=grp,
                          tx=np.full(n, 0.2))
    # Both markers share the group's attribute code.
    assert m1.attr("overscan_x").code == m2.attr("overscan_x").code
    scene, attrs = sg.bake()
    ev = evaluate(scene, attrs, jnp.arange(n))
    xy = np.asarray(ev.marker_xy)
    np.testing.assert_allclose(xy[0, :, 0] / xy[0, 0, 0],
                               [1.0, 1.1, 1.2], atol=1e-12)


def test_set_marker_screen_positions_inverts_overscan():
    sg, grp, mkr, mkr2 = _scene()
    scene, attrs = sg.bake()
    ev = evaluate(scene, attrs, jnp.arange(3))
    attrs2 = set_marker_screen_positions(
        scene, attrs, jnp.arange(3), ev.point_xy
    )
    ev2 = evaluate(scene, attrs2, jnp.arange(3))
    np.testing.assert_allclose(
        np.asarray(ev2.marker_xy), np.asarray(ev2.point_xy), atol=1e-12
    )
