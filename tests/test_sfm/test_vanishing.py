"""Vanishing-point calibration vs synthetic ground truth.

Oracle construction: pick a ground-truth camera orientation R (columns
= the world x/y/z axes expressed in camera coordinates' direction
space) and focal factor f; each world axis direction c with c.z < 0
projects to the vanishing point vp = pp - f * c.xy / c.z.  The
calibration must recover f, the axis directions, and the camera
position (ref formulas: calibrate_common.cpp:109-191,267-311,
vanishing_point.cpp:50-150).
"""

import numpy as np

from mayamatchmovesolver_tpu.sfm import vanishing


def _orthonormal_axes():
    a = np.array([0.35, 0.12, -0.95])
    a /= np.linalg.norm(a)
    b = np.array([-0.15, 0.9, -0.55])
    b -= a * (a @ b)
    b /= np.linalg.norm(b)
    c = np.cross(a, b)
    return a, b, c


def _vp_of(axis, pp, f):
    return pp - f * axis[:2] / axis[2]


FBW, FBH = 36.0, 24.0
FOCAL = 35.0
F_FACTOR = 2.0 * FOCAL / FBW


def test_focal_from_two_vps_recovers_ground_truth():
    a, b, _ = _orthonormal_axes()
    pp = np.array([0.01, -0.02])
    vp_a = _vp_of(a, pp, F_FACTOR)
    vp_b = _vp_of(b, pp, F_FACTOR)
    f, ok = vanishing.focal_length_from_two_vanishing_points(
        vp_a, vp_b, pp
    )
    assert bool(ok)
    np.testing.assert_allclose(float(f), F_FACTOR, rtol=1e-9)


def test_focal_from_two_vps_rejects_same_side():
    # Two VPs on the same side of the principal point cannot come from
    # orthogonal directions: focal^2 goes negative -> ok=False
    # (ref: calcFocalLength's validity check).
    pp = np.zeros(2)
    _, ok = vanishing.focal_length_from_two_vanishing_points(
        np.array([0.4, 0.0]), np.array([0.8, 0.05]), pp
    )
    assert not bool(ok)


def test_two_vp_calibration_recovers_rotation_and_position():
    a, b, c = _orthonormal_axes()
    pp = np.array([0.0, 0.0])
    vp_a = _vp_of(a, pp, F_FACTOR)
    vp_b = _vp_of(b, pp, F_FACTOR)

    calib = vanishing.calibrate_two_vanishing_points(
        focal_length_mm=FOCAL,
        film_back_width_mm=FBW,
        film_back_height_mm=FBH,
        origin_point=pp,  # world origin at the principal point
        principal_point=pp,
        vanishing_point_a=vp_a,
        vanishing_point_b=vp_b,
    )
    np.testing.assert_allclose(float(calib.focal_length_mm), FOCAL,
                               rtol=1e-9)
    rot = np.asarray(calib.rotation_matrix)
    np.testing.assert_allclose(rot[:, 0], a, atol=1e-9)
    np.testing.assert_allclose(rot[:, 1], b, atol=1e-9)
    np.testing.assert_allclose(rot[:, 2], c, atol=1e-9)
    # Orthonormality of the recovered frame.
    np.testing.assert_allclose(rot.T @ rot, np.eye(3), atol=1e-9)
    # Origin at the principal point => camera sits one unit along the
    # recovered -z axis: position = R @ [0, 0, -1] = -z_axis.
    np.testing.assert_allclose(
        np.asarray(calib.translation), -c, atol=1e-9
    )


def test_two_vp_origin_offset_translation():
    a, b, _ = _orthonormal_axes()
    pp = np.array([0.0, 0.0])
    vp_a = _vp_of(a, pp, F_FACTOR)
    vp_b = _vp_of(b, pp, F_FACTOR)
    origin = np.array([0.1, -0.05])
    calib = vanishing.calibrate_two_vanishing_points(
        FOCAL, FBW, FBH, origin, pp, vp_a, vp_b,
    )
    # t_cam = [dx/f, dy/f, -1] rotated into world
    # (ref: calcTranslationVector, calibrate_common.cpp:267-281).
    t_cam = np.array([0.1 / F_FACTOR, -0.05 / F_FACTOR, -1.0])
    rot = np.asarray(calib.rotation_matrix)
    np.testing.assert_allclose(
        np.asarray(calib.translation), rot @ t_cam, atol=1e-12
    )


def test_scene_scale_modes():
    t = np.array([0.3, -1.5, -2.0])
    uniform = vanishing.apply_scene_scale(
        t, vanishing.SceneScaleMode.UNIFORM_SCALE, 10.0
    )
    np.testing.assert_allclose(np.asarray(uniform), t * 10.0)
    # CAMERA_HEIGHT scales so |y| equals the given distance
    # (ref: applySceneScale, calibrate_common.cpp:285-311).
    height = vanishing.apply_scene_scale(
        t, vanishing.SceneScaleMode.CAMERA_HEIGHT, 10.0
    )
    np.testing.assert_allclose(abs(float(np.asarray(height)[1])), 10.0)
    np.testing.assert_allclose(
        np.asarray(height), t * (10.0 / 1.5), rtol=1e-12
    )


def test_one_vp_recovers_second_vp_and_matches_two_vp():
    a, b, c = _orthonormal_axes()
    pp = np.array([0.02, 0.01])
    vp_a = _vp_of(a, pp, F_FACTOR)
    vp_b = _vp_of(b, pp, F_FACTOR)

    # Horizon points anywhere along the va->vb line.
    d = vp_b - vp_a
    h1 = vp_a + 0.25 * d
    h2 = vp_a + 0.75 * d

    vp_b_est = vanishing.second_vanishing_point_from_horizon(
        vp_a, pp, h1, h2, np.asarray(F_FACTOR)
    )
    np.testing.assert_allclose(np.asarray(vp_b_est), vp_b, atol=1e-9)

    one = vanishing.calibrate_one_vanishing_point(
        FOCAL, FBW, FBH, pp, pp, vp_a, h1, h2,
    )
    two = vanishing.calibrate_two_vanishing_points(
        FOCAL, FBW, FBH, pp, pp, vp_a, vp_b,
    )
    np.testing.assert_allclose(
        np.asarray(one.rotation_matrix),
        np.asarray(two.rotation_matrix), atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(one.translation), np.asarray(two.translation),
        atol=1e-9,
    )
