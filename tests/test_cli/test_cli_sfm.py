"""CLI SfM-verb tests (camera-solve, relative-pose, homography,
pose-from-points, calibrate) — split from test_cli.py so the two xdist
workers balance (these verbs dominate the module's wall clock)."""

import json
import os

import numpy as np
import pytest

from mayamatchmovesolver_tpu import cli

from tests.test_cli.test_cli import _write_uvtrack  # shared fixture


def test_camera_solve_verb_runs(tmp_path, capsys):
    uv_path = os.path.join(tmp_path, "markers.uv")
    out_path = os.path.join(tmp_path, "sfm.json")
    _write_uvtrack(uv_path, n_frames=10, n_markers=12, with_3d=False)
    rc = cli.main([
        "camera-solve", "--markers", uv_path, "--output", out_path,
    ])
    assert rc == 0
    with open(out_path) as f:
        result = json.load(f)
    assert len(result["frames"]) == 10
    assert any(result["camera"]["frame_solved"])
    assert len(result["points"]["names"]) == 12


def test_relative_pose_verb(tmp_path):
    uv_path = os.path.join(tmp_path, "markers.uv")
    out_path = os.path.join(tmp_path, "pose.json")
    _write_uvtrack(uv_path, n_frames=10, n_markers=12, with_3d=False)
    rc = cli.main([
        "relative-pose", "--markers", uv_path,
        "--frame-a", "1", "--frame-b", "10", "--output", out_path,
    ])
    assert rc == 0
    with open(out_path) as f:
        pose = json.load(f)
    # Exact projections: every shared marker must be an inlier, and the
    # pose must be a proper rigid transform.
    assert pose["num_inliers"] == 12
    assert len(pose["inlier_markers"]) == 12
    r = np.asarray(pose["rotation"])
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-6)
    np.testing.assert_allclose(
        np.linalg.norm(pose["translation"]), 1.0, atol=1e-6
    )


def test_homography_verb_planar_scene(tmp_path):
    # Markers on a plane transfer exactly under a homography
    # (ref: MMMarkerHomographyCmd estimates H between two frames).
    import jax.numpy as jnp

    from mayamatchmovesolver_tpu.core.constants import FilmFit
    from mayamatchmovesolver_tpu.scene import SceneGraph, evaluate

    n_frames, n_markers = 4, 9
    rng = np.random.RandomState(11)
    bundles = rng.uniform(-1.5, 1.5, (n_markers, 3))
    bundles[:, 2] = 0.0  # planar
    sg = SceneGraph(frame_range=(1, n_frames))
    t = np.linspace(0.0, 1.0, n_frames)
    cam = sg.create_camera(
        "cam", tx=1.5 * t, ty=0.2 * t, tz=10.0 - t,
        rx=np.zeros(n_frames), ry=8.0 * t, rz=np.zeros(n_frames),
        focal_length_mm=35.0, sensor_width_mm=36.0,
        sensor_height_mm=24.0, film_fit=FilmFit.HORIZONTAL,
        render_width=1920, render_height=1080,
    )
    for i, b in enumerate(bundles):
        bnd = sg.create_bundle("b%d" % i, tx=b[0], ty=b[1], tz=b[2])
        sg.create_marker("m%d" % i, camera=cam, bundle=bnd)
    scene, attrs = sg.bake()
    ev = evaluate(scene, attrs, jnp.arange(n_frames))
    from mayamatchmovesolver_tpu.scene import flatscene
    fsx, fsy = flatscene.marker_fit_scale(
        scene, attrs, jnp.arange(n_frames)
    )
    point_xy = np.asarray(ev.point_xy)
    marker_xy = np.stack(
        [point_xy[..., 0] / np.asarray(fsx),
         point_xy[..., 1] / np.asarray(fsy)], axis=-1
    ) + 0.5
    points = []
    for i in range(n_markers):
        per_frame = [
            {"frame": f + 1,
             "pos": [float(marker_xy[i, f, 0]),
                     float(marker_xy[i, f, 1])],
             "pos_dist": [float(marker_xy[i, f, 0]),
                          float(marker_xy[i, f, 1])],
             "weight": 1.0}
            for f in range(n_frames)
        ]
        points.append({"name": "m%d" % i, "id": i, "set_name": "set",
                       "per_frame": per_frame})
    uv_path = os.path.join(tmp_path, "planar.uv")
    with open(uv_path, "w") as f:
        json.dump({"version": 4, "points": points}, f)

    out_path = os.path.join(tmp_path, "h.json")
    rc = cli.main([
        "homography", "--markers", uv_path,
        "--frame-a", "1", "--frame-b", "4", "--output", out_path,
    ])
    assert rc == 0
    with open(out_path) as f:
        result = json.load(f)
    assert np.asarray(result["homography"]).shape == (3, 3)
    assert result["rms_transfer_error"] < 1e-5


def test_pose_from_points_verb(tmp_path):
    from mayamatchmovesolver_tpu.sfm import camerasolve

    uv_path = os.path.join(tmp_path, "markers.uv")
    pts_path = os.path.join(tmp_path, "points.json")
    out_path = os.path.join(tmp_path, "resection.json")
    sg, cam, bundles = _write_uvtrack(
        uv_path, n_frames=6, n_markers=10, with_3d=False
    )
    # Known 3D points in the CV convention the SfM stack solves in
    # (x right, y down, z forward): world -> CV is (x, -y, -z).
    cv_pts = bundles * np.array([1.0, -1.0, -1.0])
    with open(pts_path, "w") as f:
        json.dump({"points": {
            "positions": cv_pts.tolist(),
            "names": ["m%d" % i for i in range(10)],
        }}, f)
    rc = cli.main([
        "pose-from-points", "--markers", uv_path, "--points", pts_path,
        "--points-convention", "cv",
        "--frame", "3", "--output", out_path,
    ])
    assert rc == 0
    with open(out_path) as f:
        result = json.load(f)
    r = np.asarray(result["rotation"])
    t = np.asarray(result["translation"])
    assert len(result["markers"]) == 10
    # Reproject the known points through the recovered pose: must match
    # the observed bearings.
    from mayamatchmovesolver_tpu.io import read as read_markers
    _, mkr_data = read_markers(uv_path, image_width=1920,
                               image_height=1080)
    uv = np.array([
        [md.x.get_value(3) - 0.5, md.y.get_value(3) - 0.5]
        for md in mkr_data
    ])
    bearings = np.asarray(camerasolve.markers_to_bearings(
        uv, 35.0, 36.0, 36.0 / 24.0
    ))
    pc = cv_pts @ r.T + t
    np.testing.assert_allclose(
        pc[:, :2] / pc[:, 2:], bearings, atol=1e-6
    )


def test_pose_from_points_maya_convention_and_valid(tmp_path):
    """camera-solve-style input: Maya-world points + 'valid' flags.
    Culled bundles (valid=false, garbage positions) must be dropped and
    the Maya->CV conversion applied (ADVICE round 2)."""
    from mayamatchmovesolver_tpu.sfm import camerasolve

    uv_path = os.path.join(tmp_path, "markers.uv")
    pts_path = os.path.join(tmp_path, "points.json")
    out_path = os.path.join(tmp_path, "resection.json")
    sg, cam, bundles = _write_uvtrack(
        uv_path, n_frames=6, n_markers=10, with_3d=False
    )
    # camera-solve output convention: Maya world points, two of them
    # unsolved garbage flagged valid=false.
    maya_pts = bundles.copy()
    maya_pts[3] = [99.0, -99.0, 99.0]
    maya_pts[7] = [0.0, 0.0, 0.0]
    valid = [True] * 10
    valid[3] = valid[7] = False
    with open(pts_path, "w") as f:
        json.dump({"points": {
            "positions": maya_pts.tolist(),
            "valid": valid,
            "names": ["m%d" % i for i in range(10)],
        }}, f)
    rc = cli.main([
        "pose-from-points", "--markers", uv_path, "--points", pts_path,
        "--frame", "3", "--output", out_path,
    ])
    assert rc == 0
    with open(out_path) as f:
        result = json.load(f)
    assert result["convention"] == "cv"
    assert sorted(result["markers"]) == sorted(
        "m%d" % i for i in range(10) if valid[i]
    )
    r = np.asarray(result["rotation"])
    t = np.asarray(result["translation"])
    # The recovered pose must reproject the good CV points onto the
    # observed bearings despite the garbage rows being present.
    cv_pts = bundles * np.array([1.0, -1.0, -1.0])
    from mayamatchmovesolver_tpu.io import read as read_markers
    _, mkr_data = read_markers(uv_path, image_width=1920,
                               image_height=1080)
    uv = np.array([
        [md.x.get_value(3) - 0.5, md.y.get_value(3) - 0.5]
        for md in mkr_data
    ])
    bearings = np.asarray(camerasolve.markers_to_bearings(
        uv, 35.0, 36.0, 36.0 / 24.0
    ))
    good = np.asarray(valid)
    pc = cv_pts[good] @ r.T + t
    np.testing.assert_allclose(
        pc[:, :2] / pc[:, 2:], bearings[good], atol=1e-6
    )
    # And the Maya-convention camera block round-trips through the
    # same mapping camera-solve uses.
    s = np.diag([1.0, -1.0, -1.0])
    np.testing.assert_allclose(
        np.asarray(result["camera_position_maya"]),
        s @ (-r.T @ t), atol=1e-12,
    )


def test_relative_pose_too_few_shared_markers(tmp_path):
    """4-7 shared markers: clean SystemExit, not a raw jax sampling
    error (ADVICE round 2)."""
    uv_path = os.path.join(tmp_path, "markers.uv")
    _write_uvtrack(uv_path, n_frames=4, n_markers=5, with_3d=False)
    with pytest.raises(SystemExit) as exc_info:
        cli.main([
            "relative-pose", "--markers", uv_path,
            "--frame-a", "1", "--frame-b", "4",
        ])
    assert "need >= 8" in str(exc_info.value)


def test_calibrate_rejects_both_vp_b_and_horizon(tmp_path):
    """--vanishing-point-b + --horizon together is ambiguous: error out
    instead of silently dropping the horizon (ADVICE round 2)."""
    with pytest.raises(SystemExit) as exc_info:
        cli.main([
            "calibrate",
            "--origin-point", "0", "0",
            "--vanishing-point-a", "0.3", "0.1",
            "--vanishing-point-b", "-0.4", "0.05",
            "--horizon", "-0.5", "0.0", "0.5", "0.0",
        ])
    assert "mutually exclusive" in str(exc_info.value)


def test_calibrate_verb_two_vps(tmp_path, capsys):
    # Oracle: vp = pp - f * axis.xy / axis.z for orthonormal axes
    # (same construction as tests/test_sfm/test_vanishing.py; ref
    # formulas calibrate_common.cpp:109-191).
    a = np.array([0.35, 0.12, -0.95])
    a /= np.linalg.norm(a)
    b = np.array([-0.15, 0.9, -0.55])
    b -= a * (a @ b)
    b /= np.linalg.norm(b)
    fbw, focal = 36.0, 35.0
    f_factor = 2.0 * focal / fbw
    pp = np.array([0.01, -0.02])
    vp_a = pp - f_factor * a[:2] / a[2]
    vp_b = pp - f_factor * b[:2] / b[2]
    out_path = os.path.join(tmp_path, "calib.json")
    rc = cli.main([
        "calibrate",
        "--origin-point", "0.0", "0.0",
        "--principal-point", str(pp[0]), str(pp[1]),
        "--vanishing-point-a", str(vp_a[0]), str(vp_a[1]),
        "--vanishing-point-b", str(vp_b[0]), str(vp_b[1]),
        "--focal-length", "50.0",  # deliberately wrong user focal
        "--output", out_path,
    ])
    assert rc == 0
    with open(out_path) as f:
        calib = json.load(f)
    assert calib["ok"]
    np.testing.assert_allclose(calib["focal_length_mm"], focal,
                               rtol=1e-6)
    r = np.asarray(calib["rotation_matrix"])
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-9)
