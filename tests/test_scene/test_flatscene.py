"""FlatScene evaluation tests against a straightforward NumPy oracle.

The reference's equivalent coverage is its Rust integration tests
(ref: lib/rust/mmscenegraph/tests/create_dag_scene.rs,
reprojection.rs) and the MayaDAG<->MMSceneGraph agreement matrix
(ref: tests/test/test_solver/test1.py:124-158).  Here the oracle is a
direct NumPy re-computation.
"""

import numpy as np
import jax.numpy as jnp

from mayamatchmovesolver_tpu.core.constants import FilmFit, RotateOrder
from mayamatchmovesolver_tpu.scene import SceneGraph, evaluate


def _np_trs(tx, ty, tz, rx, ry, rz, sx=1.0, sy=1.0, sz=1.0):
    rad = np.radians
    cx, sx_ = np.cos(rad(rx)), np.sin(rad(rx))
    cy, sy_ = np.cos(rad(ry)), np.sin(rad(ry))
    cz, sz_ = np.cos(rad(rz)), np.sin(rad(rz))
    mx = np.array([[1, 0, 0], [0, cx, -sx_], [0, sx_, cx]])
    my = np.array([[cy, 0, sy_], [0, 1, 0], [-sy_, 0, cy]])
    mz = np.array([[cz, -sz_, 0], [sz_, cz, 0], [0, 0, 1]])
    m = np.eye(4)
    m[:3, :3] = (mz @ my @ mx) @ np.diag([sx, sy, sz])
    m[:3, 3] = [tx, ty, tz]
    return m


def test_world_matrix_hierarchy_depth3():
    sg = SceneGraph(frame_range=(1, 3))
    a = sg.create_transform("a", tx=1.0, ry=np.array([0.0, 45.0, 90.0]))
    b = sg.create_transform("b", parent=a, ty=2.0, rz=30.0)
    c = sg.create_transform("c", parent=b, tz=np.array([3.0, 4.0, 5.0]))
    cam = sg.create_camera("cam", tz=10.0)
    bnd = sg.create_bundle("bnd", parent=c, tx=0.5)
    sg.create_marker("mkr", camera=cam, bundle=bnd)
    scene, attrs = sg.bake()
    out = evaluate(scene, attrs, jnp.arange(3))

    for f in range(3):
        ma = _np_trs(1.0, 0, 0, 0, [0.0, 45.0, 90.0][f], 0)
        mb = _np_trs(0, 2.0, 0, 0, 0, 30.0)
        mc = _np_trs(0, 0, [3.0, 4.0, 5.0][f], 0, 0, 0)
        mbnd = _np_trs(0.5, 0, 0, 0, 0, 0)
        world_c = ma @ mb @ mc
        world_bnd = world_c @ mbnd
        np.testing.assert_allclose(
            np.asarray(out.tfm_world[c.index, f]), world_c, atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(out.bnd_world_point[0, f]), world_bnd[:3, 3],
            atol=1e-12,
        )


def test_reprojection_center_and_offset():
    """Camera at origin looking down -Z, bundle on the axis projects to
    (0, 0); offset bundle projects to a positive/negative quadrant."""
    sg = SceneGraph(frame_range=(1, 1))
    cam = sg.create_camera(
        "cam", tz=10.0, focal_length_mm=35.0,
        sensor_width_mm=36.0, sensor_height_mm=24.0,
        film_fit=FilmFit.HORIZONTAL, render_width=2048, render_height=1556,
    )
    b0 = sg.create_bundle("b0", tz=-10.0)  # straight ahead
    b1 = sg.create_bundle("b1", tx=1.0, ty=1.0, tz=-10.0)
    sg.create_marker("m0", camera=cam, bundle=b0)
    sg.create_marker("m1", camera=cam, bundle=b1)
    scene, attrs = sg.bake()
    out = evaluate(scene, attrs, jnp.asarray([0]))

    np.testing.assert_allclose(
        np.asarray(out.point_xy[0, 0]), [0.0, 0.0], atol=1e-12
    )
    x, y = np.asarray(out.point_xy[1, 0])
    assert x > 0 and y > 0
    # Oracle: for horizontal film fit the NDC x is
    # (x_cam / -z_cam) * focal / (0.5 * filmback_w) (in matching units).
    # With focal 35mm, fb 36mm: x_ndc = (1/20)*35/18... in cm units:
    focal_cm = 3.5
    half_fb_w_cm = (3.6 / 2.0)
    expect_x = (1.0 / 20.0) * (focal_cm / half_fb_w_cm) * 0.5
    np.testing.assert_allclose(x, expect_x, rtol=1e-10)


def test_behind_camera_flag():
    sg = SceneGraph(frame_range=(1, 1))
    cam = sg.create_camera("cam", tz=0.0)
    front = sg.create_bundle("front", tz=-5.0)
    back = sg.create_bundle("back", tz=5.0)
    sg.create_marker("mf", camera=cam, bundle=front)
    sg.create_marker("mb", camera=cam, bundle=back)
    scene, attrs = sg.bake()
    out = evaluate(scene, attrs, jnp.asarray([0]))
    assert not bool(out.behind_camera[0, 0])
    assert bool(out.behind_camera[1, 0])


def test_marker_film_fit_scaling_horizontal():
    """Marker Y is scaled by render/film aspect under horizontal fit
    (ref: flat.rs:73-97)."""
    sg = SceneGraph(frame_range=(1, 1))
    cam = sg.create_camera(
        "cam", film_fit=FilmFit.HORIZONTAL,
        sensor_width_mm=36.0, sensor_height_mm=24.0,
        render_width=2048, render_height=1556,
    )
    bnd = sg.create_bundle("bnd", tz=-10.0)
    sg.create_marker("mkr", camera=cam, bundle=bnd, tx=0.25, ty=0.25)
    scene, attrs = sg.bake()
    out = evaluate(scene, attrs, jnp.asarray([0]))
    render_aspect = 2048.0 / 1556.0
    film_aspect = 36.0 / 24.0
    np.testing.assert_allclose(
        np.asarray(out.marker_xy[0, 0]),
        [0.25, 0.25 * render_aspect / film_aspect],
        atol=1e-12,
    )


def test_animated_camera_reprojection_matches_per_frame_eval():
    """Evaluating N frames at once == evaluating each frame alone."""
    n = 5
    sg = SceneGraph(frame_range=(1, n))
    cam = sg.create_camera(
        "cam",
        tx=np.linspace(-2.0, 2.0, n),
        ry=np.linspace(-10.0, 10.0, n),
        tz=12.0,
    )
    bnd = sg.create_bundle("bnd", tx=0.3, ty=-0.2, tz=-3.0)
    sg.create_marker("mkr", camera=cam, bundle=bnd)
    scene, attrs = sg.bake()

    full = evaluate(scene, attrs, jnp.arange(n))
    for f in range(n):
        single = evaluate(scene, attrs, jnp.asarray([f]))
        np.testing.assert_allclose(
            np.asarray(full.point_xy[:, f]),
            np.asarray(single.point_xy[:, 0]),
            atol=1e-12,
        )


def test_rotated_camera_parity_with_manual_math():
    """Full manual oracle: rotated+translated camera, explicit matrices."""
    sg = SceneGraph(frame_range=(1, 1))
    cam = sg.create_camera(
        "cam", tx=2.0, ty=1.5, tz=8.0, rx=-10.0, ry=25.0, rz=5.0,
        rotate_order=RotateOrder.ZXY,
        focal_length_mm=50.0, sensor_width_mm=36.0, sensor_height_mm=24.0,
        film_fit=FilmFit.FILL, render_width=1920, render_height=1080,
    )
    bnd = sg.create_bundle("bnd", tx=0.7, ty=-0.4, tz=-6.0)
    sg.create_marker("mkr", camera=cam, bundle=bnd)
    scene, attrs = sg.bake()
    out = evaluate(scene, attrs, jnp.asarray([0]))

    # NumPy oracle.
    rad = np.radians
    def rot(ax, ang):
        c, s = np.cos(rad(ang)), np.sin(rad(ang))
        if ax == "x":
            return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
        if ax == "y":
            return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])

    # ZXY apply order -> R = Ry Rx Rz
    r = rot("y", 25.0) @ rot("x", -10.0) @ rot("z", 5.0)
    cam_world = np.eye(4)
    cam_world[:3, :3] = r
    cam_world[:3, 3] = [2.0, 1.5, 8.0]

    from mayamatchmovesolver_tpu.core import camera as cam_math
    proj = np.asarray(
        cam_math.projection_matrix(
            50.0, 36.0 / 25.4, 24.0 / 25.4, 0.0, 0.0,
            1920.0, 1080.0, int(FilmFit.FILL), 0.1, 10000.0, 1.0,
        )
    )
    p = np.array([0.7, -0.4, -6.0, 1.0])
    clip = proj @ np.linalg.inv(cam_world) @ p
    want = clip[:2] / clip[3] * 0.5
    np.testing.assert_allclose(np.asarray(out.point_xy[0, 0]), want,
                               atol=1e-10)


def test_film_offset_pans_projection():
    """Nonzero lens offset pans the image like Maya's film offset.

    The reference's Rust backend loses the frustum-asymmetry terms by
    using Maya's row-vector projection listing with column vectors
    (camera.rs:253-278); Maya itself (the MayaDAG backend, authoritative
    for film offset, maya_camera.cpp getProjMatrix) pans.  For an
    on-axis point: x_marker = -(offset/film_width) * scale_x where
    scale_x = render_aspect / film_aspect (horizontal fit)."""
    off_mm = 9.0
    sg = SceneGraph(frame_range=(1, 1))
    cam = sg.create_camera(
        "cam", tz=10.0, focal_length_mm=35.0,
        sensor_width_mm=36.0, sensor_height_mm=24.0,
        lens_offset_x_mm=off_mm,
        film_fit=FilmFit.HORIZONTAL, render_width=2048,
        render_height=1556,
    )
    b0 = sg.create_bundle("b0", tz=-10.0)
    sg.create_marker("m0", camera=cam, bundle=b0)
    scene, attrs = sg.bake()
    out = evaluate(scene, attrs, jnp.asarray([0]))
    scale_x = (2048.0 / 1556.0) / (36.0 / 24.0)
    expect_x = -(off_mm / 36.0) * scale_x
    np.testing.assert_allclose(
        np.asarray(out.point_xy[0, 0]), [expect_x, 0.0], atol=1e-12
    )
