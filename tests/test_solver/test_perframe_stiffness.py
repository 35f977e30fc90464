"""Per-frame solve parity (stop reasons, revert, masks, sequential
Kalman mode) and live stiffness/smoothness soft constraints.

Reference behaviors covered: per-frame accept-only-better revert
(ref: adjust_base.cpp:1208-1244, 1430-1484), value prediction between
per-frame solves (ref: _execute/main.py:483-497), stiffness/smoothness
residuals computed against current-parameter neighbor values
(ref: adjust_measureErrors.cpp:311-387).
"""

import jax.numpy as jnp
import numpy as np

import mayamatchmovesolver_tpu.api as mmapi
from mayamatchmovesolver_tpu.core.constants import FilmFit
from mayamatchmovesolver_tpu.scene import SceneGraph, evaluate, flatscene
from mayamatchmovesolver_tpu.solver.solve import (
    SolverOptions,
    build_stiffness,
    merge_stiffness,
    solve,
    solve_per_frame,
)

NUM_FRAMES = 8


def _make_scene(bundle_tx, marker_tx_raw=None, marker_ty_raw=None):
    sg = SceneGraph(frame_range=(1, NUM_FRAMES))
    cam = sg.create_camera(
        "cam", tx=0.0, ty=0.0, tz=10.0,
        focal_length_mm=35.0, sensor_width_mm=36.0, sensor_height_mm=24.0,
        film_fit=FilmFit.HORIZONTAL,
        render_width=1500, render_height=1000,
    )
    bnd = sg.create_bundle(
        "bnd", tx=bundle_tx,
        ty=np.zeros(NUM_FRAMES), tz=np.zeros(NUM_FRAMES),
    )
    values = {}
    if marker_tx_raw is not None:
        values = dict(tx=marker_tx_raw, ty=marker_ty_raw)
    sg.create_marker("mkr", camera=cam, bundle=bnd, **values)
    return sg, bnd


def _tracking_scene(bundle_tx=None, jitter=0.0, seed=0):
    """Static camera, one bundle animating in x, marker = ground truth
    track (optionally jittered).  Marker values live in the scene graph
    so Collection re-bakes see them too."""
    rng = np.random.RandomState(seed)
    true_tx = np.linspace(-2.0, 2.0, NUM_FRAMES)

    # Ground-truth screen track from the true bundle motion (+ jitter).
    gt_sg, _ = _make_scene(true_tx)
    gscene, gattrs = gt_sg.bake()
    ev = evaluate(gscene, gattrs, jnp.arange(NUM_FRAMES))
    track = np.asarray(ev.point_xy)  # (1, F, 2)
    track = track + jitter * rng.standard_normal(track.shape)
    fsx, fsy = flatscene.marker_fit_scale(
        gscene, gattrs, jnp.arange(NUM_FRAMES)
    )
    raw_x = track[0, :, 0] / np.asarray(fsx)[0]
    raw_y = track[0, :, 1] / np.asarray(fsy)[0]

    sg, bnd = _make_scene(
        true_tx if bundle_tx is None else bundle_tx,
        marker_tx_raw=raw_x, marker_ty_raw=raw_y,
    )
    scene, attrs = sg.bake()
    return sg, scene, attrs, bnd, true_tx


def test_per_frame_result_richness():
    sg, scene, attrs, bnd, true_tx = _tracking_scene(
        bundle_tx=np.zeros(NUM_FRAMES)
    )
    attrs_out, result = solve_per_frame(
        scene, attrs, range(NUM_FRAMES), [bnd.attr("tx")],
        SolverOptions(iterations=20),
    )
    assert result.success
    assert result.error_initial > result.error_final
    assert len(result.per_frame_stop_reason) == NUM_FRAMES
    assert all(s in (1, 2, 3, 4) for s in result.per_frame_stop_reason)
    assert len(result.per_frame_error.frames) == NUM_FRAMES
    assert "marker_0" in result.per_marker_error
    solved = np.asarray(attrs_out.anim_values)[
        bnd.attr("tx").code // 2
    ]
    np.testing.assert_allclose(solved, true_tx, atol=1e-4)


def test_per_frame_revert_keeps_old_values():
    """Starting AT the optimum, no frame can improve -> every frame is
    reverted and the attr block is unchanged
    (ref: acceptOnlyBetter, adjust_base.cpp:1208-1244)."""
    sg, scene, attrs, bnd, true_tx = _tracking_scene()  # starts at truth
    attrs_out, result = solve_per_frame(
        scene, attrs, range(NUM_FRAMES), [bnd.attr("tx")],
        SolverOptions(iterations=5),
    )
    assert all(result.per_frame_reverted)
    np.testing.assert_array_equal(
        np.asarray(attrs_out.anim_values), np.asarray(attrs.anim_values)
    )


def test_per_frame_explicit_marker_frame_mask():
    """An explicit per-(marker,frame) mask survives (round-1 bug:
    frame-0's column was broadcast to all frames)."""
    sg, scene, attrs, bnd, true_tx = _tracking_scene(
        bundle_tx=np.zeros(NUM_FRAMES)
    )
    mask = np.ones((1, NUM_FRAMES), dtype=bool)
    mask[0, 3] = False  # frame 3 measures nothing -> cannot solve
    attrs_out, result = solve_per_frame(
        scene, attrs, range(NUM_FRAMES), [bnd.attr("tx")],
        SolverOptions(iterations=20), marker_frame_mask=mask,
    )
    solved = np.asarray(attrs_out.anim_values)[bnd.attr("tx").code // 2]
    others = [f for f in range(NUM_FRAMES) if f != 3]
    np.testing.assert_allclose(solved[others], true_tx[others], atol=1e-4)
    # Frame 3 had no measurements: reverted to its initial value.
    assert abs(solved[3] - 0.0) < 1e-12


def test_sequential_kalman_mode_matches_parallel():
    sg, scene, attrs, bnd, true_tx = _tracking_scene(
        bundle_tx=np.zeros(NUM_FRAMES)
    )
    attrs_seq, result_seq = solve_per_frame(
        scene, attrs, range(NUM_FRAMES), [bnd.attr("tx")],
        SolverOptions(iterations=20), sequential=True,
    )
    assert result_seq.success
    solved = np.asarray(attrs_seq.anim_values)[bnd.attr("tx").code // 2]
    np.testing.assert_allclose(solved, true_tx, atol=1e-4)


def test_smoothness_damps_jitter():
    """A smoothness-weighted solve visibly damps a jittery track
    (VERDICT round-1 acceptance bar for live soft constraints)."""
    jitter = 2e-3  # screen units of track noise

    def total_wiggle(smooth_weight):
        sg, scene, attrs, bnd, _ = _tracking_scene(
            bundle_tx=np.zeros(NUM_FRAMES), jitter=jitter, seed=7
        )
        stiff = None
        if smooth_weight:
            stiff = build_stiffness(
                attrs, [bnd.attr("tx")], range(NUM_FRAMES),
                weight=smooth_weight, variance=0.02, mode="smoothness",
            )
        attrs_out, result = solve(
            scene, attrs, range(NUM_FRAMES), [bnd.attr("tx")],
            SolverOptions(iterations=30), stiffness=stiff,
        )
        curve = np.asarray(attrs_out.anim_values)[
            bnd.attr("tx").code // 2
        ]
        return np.abs(np.diff(curve, n=2)).sum()

    rough = total_wiggle(0.0)
    damped = total_wiggle(3.0)
    assert damped < 0.6 * rough, (rough, damped)


def test_collection_stiffness_api():
    sg, scene, attrs, bnd, _ = _tracking_scene(
        bundle_tx=np.zeros(NUM_FRAMES), jitter=2e-3, seed=9
    )
    col = mmapi.Collection(sg)
    col.add_marker(sg._markers[0])
    col.add_attribute(bnd.attr("tx"))
    col.set_attribute_smoothness(bnd.attr("tx"), weight=3.0,
                                 variance=0.02)
    col.set_solver(mmapi.SolverStep(frame_indices=range(NUM_FRAMES)))
    attrs_out, results = mmapi.execute(col)
    assert results[0].success


def test_merge_stiffness():
    sg, scene, attrs, bnd, _ = _tracking_scene()
    a = build_stiffness(attrs, [bnd.attr("tx")], range(NUM_FRAMES),
                        weight=1.0, mode="stiffness")
    b = build_stiffness(attrs, [bnd.attr("tx")], range(NUM_FRAMES),
                        weight=2.0, mode="smoothness")
    merged = merge_stiffness(a, b)
    assert len(merged["codes"]) == len(a["codes"]) + len(b["codes"])
    assert set(merged["mode"]) == {1, 2}
