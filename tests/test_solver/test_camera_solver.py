"""SolverCamera end-to-end: a Collection with only markers recovers
camera trajectory, bundle structure AND focal length through
mmapi.execute().

Counterpart of the reference's camera-solve integration tests
(ref: tests/test/test_api/test_camera_solve_garage.py etc., driving
python/mmSolver/_api/solvercamera.py:48 + solvercamerautils.py:958-1290;
data fixtures are absent from the snapshot so ground truth is
synthesized).
"""

import jax.numpy as jnp
import numpy as np

import mayamatchmovesolver_tpu.api as mmapi
from mayamatchmovesolver_tpu.core.constants import FilmFit
from mayamatchmovesolver_tpu.scene import SceneGraph, evaluate, flatscene


NUM_FRAMES = 16
NUM_POINTS = 24
RENDER_W, RENDER_H = 1500, 1000


def _ground_truth_tracks(focal=40.0, seed=3):
    """Synthesize a moving-camera shot; return (tracks (M,F,2) in screen
    space, fit scales, true camera positions, true points)."""
    rng = np.random.RandomState(seed)
    sg = SceneGraph(frame_range=(1, NUM_FRAMES))
    t = np.linspace(0.0, 1.0, NUM_FRAMES)
    cam_t = np.stack([
        6.0 * t,
        0.5 + 0.4 * np.sin(3.0 * t),
        9.0 - 2.0 * t,
    ])
    cam_r = np.stack([
        2.0 * np.sin(2.0 * t),
        -18.0 * t,
        np.zeros(NUM_FRAMES),
    ])
    cam = sg.create_camera(
        "cam",
        tx=cam_t[0], ty=cam_t[1], tz=cam_t[2],
        rx=cam_r[0], ry=cam_r[1], rz=cam_r[2],
        focal_length_mm=focal,
        sensor_width_mm=36.0, sensor_height_mm=24.0,
        film_fit=FilmFit.HORIZONTAL,
        render_width=RENDER_W, render_height=RENDER_H,
    )
    pts = np.stack([
        rng.uniform(-4, 10, NUM_POINTS),
        rng.uniform(-2, 4, NUM_POINTS),
        rng.uniform(-6, 2, NUM_POINTS),
    ], axis=-1)
    for i, p in enumerate(pts):
        b = sg.create_bundle("b%d" % i, tx=p[0], ty=p[1], tz=p[2])
        sg.create_marker("m%d" % i, camera=cam, bundle=b)
    scene, attrs = sg.bake()
    ev = evaluate(scene, attrs, jnp.arange(NUM_FRAMES))
    fsx, fsy = flatscene.marker_fit_scale(
        scene, attrs, jnp.arange(NUM_FRAMES)
    )
    return (
        np.asarray(ev.point_xy),
        (np.asarray(fsx), np.asarray(fsy)),
        cam_t.T,
        pts,
    )


def _build_unsolved_scene(tracks, fit, focal_guess=35.0):
    """A fresh scene: animated camera parked at identity-ish values,
    bundles at placeholder positions, markers carrying the tracks."""
    fsx, fsy = fit
    sg = SceneGraph(frame_range=(1, NUM_FRAMES))
    zeros = np.zeros(NUM_FRAMES)
    cam = sg.create_camera(
        "cam",
        tx=zeros, ty=zeros, tz=zeros,
        rx=zeros, ry=zeros, rz=zeros,
        focal_length_mm=focal_guess,
        sensor_width_mm=36.0, sensor_height_mm=24.0,
        film_fit=FilmFit.HORIZONTAL,
        render_width=RENDER_W, render_height=RENDER_H,
    )
    markers = []
    for i in range(tracks.shape[0]):
        b = sg.create_bundle("b%d" % i, tx=0.0, ty=0.0, tz=0.0)
        markers.append(sg.create_marker(
            "m%d" % i, camera=cam, bundle=b,
            tx=tracks[i, :, 0] / fsx[i],
            ty=tracks[i, :, 1] / fsy[i],
        ))
    return sg, cam, markers


def _run_camera_solve(tracks, fit, solve_focal=True):
    sg, cam, markers = _build_unsolved_scene(tracks, fit)
    col = mmapi.Collection(sg)
    col.add_marker(*markers)
    col.set_solver(mmapi.SolverCamera(
        frame_indices=range(NUM_FRAMES), solve_focal=solve_focal,
        refine_rounds=1, ba_iterations=20,
    ))
    ok, messages = mmapi.validate(col)
    assert ok, messages
    attrs_out, results = mmapi.execute(col)
    return sg, cam, attrs_out, results[0]


def test_camera_solver_recovers_shot_and_focal():
    tracks, fit, _, _ = _ground_truth_tracks(focal=40.0)
    sg, cam, attrs_out, result = _run_camera_solve(tracks, fit)
    assert result.success, result.reason_string
    # Reprojection RMS under 1 px (VERDICT round-1 acceptance bar).
    assert result.error_avg < 1.0, result.error_avg
    # Focal recovered despite the wrong 35mm guess (truth: 40mm).
    fcode = cam.attr("focal_length_mm").code
    focal = float(np.asarray(attrs_out.static_values)[fcode // 2])
    assert abs(focal - 40.0) < 1.0, focal


def test_camera_solver_noise_robustness():
    tracks, fit, _, _ = _ground_truth_tracks(focal=40.0, seed=5)
    rng = np.random.RandomState(11)
    noisy = tracks + rng.normal(0.0, 0.5 / RENDER_W, tracks.shape)
    sg, cam, attrs_out, result = _run_camera_solve(noisy, fit)
    assert result.success, result.reason_string
    # 0.5 px gaussian track noise: the solve should stay near the noise
    # floor, not blow up.
    assert result.error_avg < 2.0, result.error_avg


def test_camera_solver_requires_markers():
    tracks, fit, _, _ = _ground_truth_tracks()
    sg, cam, markers = _build_unsolved_scene(tracks, fit)
    col = mmapi.Collection(sg)
    col.add_marker(markers[0])  # too few
    col.set_solver(mmapi.SolverCamera(frame_indices=range(NUM_FRAMES)))
    attrs_out, results = mmapi.execute(col)
    assert not results[0].success
