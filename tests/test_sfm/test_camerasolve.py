"""End-to-end camera solve: synthesize a moving camera with our own
scene engine, recover trajectory + structure, verify up to the gauge
(similarity) freedom.

Equivalent coverage to the reference's camera-solve integration tests
(ref: tests/test/test_api/test_camera_solve_garage.py etc. — whose data
fixtures are absent from the snapshot, so ground truth is synthesized;
see SURVEY.md section 4)."""

import numpy as np
import jax.numpy as jnp

from mayamatchmovesolver_tpu.core.constants import FilmFit
from mayamatchmovesolver_tpu.scene import SceneGraph, evaluate
from mayamatchmovesolver_tpu.sfm import camerasolve


def _synthesize(num_frames=10, num_points=24, seed=0):
    rng = np.random.RandomState(seed)
    sg = SceneGraph(frame_range=(1, num_frames))
    cam_t = np.stack(
        [
            np.linspace(0.0, 4.0, num_frames),
            0.5 + 0.2 * np.sin(np.linspace(0, 3, num_frames)),
            8.0 + np.linspace(0.0, -1.0, num_frames),
        ]
    )
    cam_r = np.stack(
        [
            np.zeros(num_frames),
            np.linspace(0.0, -15.0, num_frames),
            np.zeros(num_frames),
        ]
    )
    cam = sg.create_camera(
        "cam",
        tx=cam_t[0], ty=cam_t[1], tz=cam_t[2],
        rx=cam_r[0], ry=cam_r[1], rz=cam_r[2],
        focal_length_mm=35.0,
        sensor_width_mm=36.0, sensor_height_mm=24.0,
        film_fit=FilmFit.HORIZONTAL,
        render_width=1500, render_height=1000,
    )
    pts = np.stack(
        [
            rng.uniform(-4, 8, num_points),
            rng.uniform(-2, 3, num_points),
            rng.uniform(-6, 2, num_points),
        ],
        axis=-1,
    )
    bundles = [
        sg.create_bundle("b%d" % i, tx=p[0], ty=p[1], tz=p[2])
        for i, p in enumerate(pts)
    ]
    for i, b in enumerate(bundles):
        sg.create_marker("m%d" % i, camera=cam, bundle=b)
    scene, attrs = sg.bake()
    ev = evaluate(scene, attrs, jnp.arange(num_frames))
    marker_xy = np.asarray(ev.point_xy)  # ground-truth tracks
    enable = np.ones(marker_xy.shape[:2], bool)
    return marker_xy, enable, cam_t.T, pts


def _umeyama_similarity(src, dst):
    """Best similarity transform src -> dst (for gauge alignment)."""
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = dc.T @ sc / len(src)
    u, d, vt = np.linalg.svd(cov)
    sgn = np.eye(3)
    if np.linalg.det(u @ vt) < 0:
        sgn[2, 2] = -1
    r = u @ sgn @ vt
    var = (sc**2).sum() / len(src)
    scale = np.trace(np.diag(d) @ sgn) / var
    t = mu_d - scale * r @ mu_s
    return scale, r, t


import pytest


@pytest.fixture(scope="module")
def _solved():
    """One camera_solve shared by the module's tests (the pipeline
    compiles a dozen XLA programs; set_origin_frame only needs *a*
    result, not its own shapes)."""
    marker_xy, enable, cam_positions, pts_true = _synthesize()
    result = camerasolve.camera_solve(
        marker_xy, enable, focal_length_mm=35.0,
        film_back_width_mm=36.0, film_back_height_mm=24.0,
        min_pair_separation=5,
    )
    return result, cam_positions, pts_true


def test_camera_solve_recovers_trajectory_and_points(_solved):
    result, cam_positions, pts_true = _solved
    assert result.frame_solved.all()
    assert result.point_valid.sum() >= 20

    # Align recovered structure to ground truth with one similarity
    # transform; the reconstruction itself is up to that gauge.
    valid = result.point_valid
    scale, r, t = _umeyama_similarity(
        result.points3d[valid], pts_true[valid]
    )
    aligned_pts = (scale * (r @ result.points3d[valid].T)).T + t
    err_pts = np.linalg.norm(aligned_pts - pts_true[valid], axis=-1)
    assert np.median(err_pts) < 0.05, np.median(err_pts)

    aligned_cams = (scale * (r @ result.positions.T)).T + t
    err_cam = np.linalg.norm(aligned_cams - cam_positions, axis=-1)
    assert np.median(err_cam) < 0.05, np.median(err_cam)


def test_set_origin_frame(_solved):
    result, _, _ = _solved
    normalized = camerasolve.set_origin_frame(result, origin_frame=0)
    np.testing.assert_allclose(
        normalized.positions[0], np.zeros(3), atol=1e-9
    )
    np.testing.assert_allclose(
        normalized.rotations[0], np.eye(3), atol=1e-9
    )
