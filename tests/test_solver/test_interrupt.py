"""Cooperative interruption / progress hooks for long solves.

The reference polls MComputation::isInterruptRequested inside its
residual callback and Jacobian loop so artists can abort a running
solve and keep the best parameters found
(ref: src/mmSolver/adjust/adjust_solveFunc.cpp:567-571,321-325); it
also prints per-iteration progress lines (adjust_solveFunc.cpp:616-622).
Here the LM runs in resumable iteration blocks: the host regains
control between dispatches for callbacks / interruption / wall-clock
budgets, and the block state checkpoints to disk.
"""

import numpy as np
import jax.numpy as jnp

from mayamatchmovesolver_tpu.core.constants import FilmFit
from mayamatchmovesolver_tpu.scene import SceneGraph, evaluate
from mayamatchmovesolver_tpu.scene.flatscene import (
    set_marker_screen_positions,
)
from mayamatchmovesolver_tpu.solver import SolverOptions, solve
from mayamatchmovesolver_tpu.solver import checkpoint, lm


def _tracked_scene(num_frames=8, num_bundles=6, seed=0):
    rng = np.random.RandomState(seed)
    sg = SceneGraph(frame_range=(1, num_frames))
    cam = sg.create_camera(
        "cam",
        tx=np.linspace(-1, 1, num_frames), ty=0.5, tz=10.0,
        ry=np.linspace(-4, 4, num_frames),
        focal_length_mm=35.0, film_fit=FilmFit.HORIZONTAL,
        render_width=1920, render_height=1080,
    )
    bundles = [
        sg.create_bundle(
            "b%d" % i, tx=rng.uniform(-3, 3), ty=rng.uniform(-1, 2),
            tz=rng.uniform(-9, -4),
        )
        for i in range(num_bundles)
    ]
    for i, b in enumerate(bundles):
        sg.create_marker("m%d" % i, camera=cam, bundle=b)
    scene, attrs = sg.bake()
    ev = evaluate(scene, attrs, jnp.arange(num_frames))
    attrs = set_marker_screen_positions(
        scene, attrs, jnp.arange(num_frames), ev.point_xy
    )
    return scene, attrs, cam, bundles


def _perturbed(attrs, bundles, scale=0.4, seed=1):
    rng = np.random.RandomState(seed)
    static = np.array(attrs.static_values)
    solve_attrs = []
    for b in bundles:
        for ch in ("tx", "ty", "tz"):
            a = b.attr(ch)
            static[a.code // 2] += rng.uniform(-scale, scale)
            solve_attrs.append(a)
    return attrs._replace(static_values=jnp.asarray(static)), solve_attrs


def test_chunked_driver_matches_fused():
    """Hooks engaged (no-op callback): identical parameters and stop
    reason to the single-dispatch fused program."""
    scene, attrs0, cam, bundles = _tracked_scene()
    attrs, solve_attrs = _perturbed(attrs0, bundles)
    frames = list(range(8))
    fused_attrs, fused = solve(
        scene, attrs, frames, solve_attrs,
        SolverOptions(iterations=30, image_width=1920.0,
                      accept_only_better=False),
    )
    calls = []
    chunked_attrs, chunked = solve(
        scene, attrs, frames, solve_attrs,
        SolverOptions(iterations=30, image_width=1920.0,
                      accept_only_better=False,
                      iteration_callback=lambda it, cost:
                      calls.append((it, cost)),
                      callback_interval=4),
    )
    assert chunked.success
    assert not chunked.user_interrupted
    assert chunked.stop_reason == fused.stop_reason
    assert chunked.iterations == fused.iterations
    np.testing.assert_allclose(
        np.asarray(chunked_attrs.static_values),
        np.asarray(fused_attrs.static_values), rtol=0, atol=1e-12,
    )
    # Callback saw monotonically increasing iterations, last == final.
    assert calls and calls[-1][0] == chunked.iterations
    its = [c[0] for c in calls]
    assert its == sorted(its)
    # Costs are non-increasing (LM only accepts improvements).
    costs = [c[1] for c in calls]
    assert all(b <= a * (1 + 1e-12) for a, b in zip(costs, costs[1:]))


def test_interrupt_stops_early_keeps_progress():
    scene, attrs0, cam, bundles = _tracked_scene()
    attrs, solve_attrs = _perturbed(attrs0, bundles)
    frames = list(range(8))
    state = {"blocks": 0}

    def interrupt():
        state["blocks"] += 1
        return state["blocks"] >= 2  # allow 2 blocks then abort

    new_attrs, result = solve(
        scene, attrs, frames, solve_attrs,
        SolverOptions(iterations=100, image_width=1920.0,
                      eps1=0.0, eps2=0.0, eps3=0.0,  # never converge
                      interrupt_check=interrupt, callback_interval=2),
    )
    assert result.user_interrupted
    assert "interrupted" in result.reason_string
    assert result.iterations == 4  # 2 blocks x 2 iterations
    # Progress kept: error reduced vs the initial state.
    assert result.error_final < result.error_initial


def test_max_seconds_budget_interrupts():
    scene, attrs0, cam, bundles = _tracked_scene()
    attrs, solve_attrs = _perturbed(attrs0, bundles)
    _, result = solve(
        scene, attrs, list(range(8)), solve_attrs,
        SolverOptions(iterations=10000, image_width=1920.0,
                      eps1=0.0, eps2=0.0, eps3=0.0,
                      max_seconds=1e-9, callback_interval=1),
    )
    assert result.user_interrupted
    assert result.iterations <= 2


def test_lm_state_checkpoint_roundtrip(tmp_path):
    """Interrupt a solve, checkpoint the LM block state, reload, and
    the loaded state resumes through lm_run_block to the fused result."""

    def residual(x):
        # Rosenbrock-ish least squares
        return jnp.stack([10.0 * (x[1] - x[0] ** 2), 1.0 - x[0]])

    config = lm.LMConfig(max_iterations=60, eps1=1e-12, eps2=1e-12,
                         eps3=1e-12)
    x0 = jnp.asarray([-1.2, 1.0])
    st = lm.lm_init(residual, x0, config)
    cost0 = st.cost
    st = lm.lm_run_block(residual, st, config, iteration_limit=5)
    path = str(tmp_path / "lm_state.npz")
    checkpoint.save_lm_state(path, st, metadata={"note": "block 1"})
    loaded, meta = checkpoint.load_lm_state(path)
    assert meta["note"] == "block 1"
    for f in lm.LMState._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(loaded, f)), np.asarray(getattr(st, f))
        )
    resumed = lm.lm_run_block(residual, loaded, config)
    direct = lm.levenberg_marquardt(residual, x0, config)
    np.testing.assert_allclose(np.asarray(resumed.x),
                               np.asarray(direct.x), atol=1e-12)
    final = lm.lm_finalize(resumed, cost0)
    assert float(final.cost) < 1e-20


def test_profile_dir_captures_trace(tmp_path):
    """SolverOptions(profile_dir=...) writes a jax.profiler trace of
    the solve (the MProfiler-scope counterpart,
    ref: adjust_solveFunc.cpp:573-579)."""
    import os

    scene, attrs, cam, bundles = _tracked_scene()
    static = np.array(attrs.static_values)
    static[bundles[0].attr("tx").code // 2] += 0.2
    attrs = attrs._replace(static_values=jnp.asarray(static))
    trace_dir = str(tmp_path / "trace")
    _, result = solve(
        scene, attrs, np.arange(8),
        [bundles[0].attr("tx"), bundles[0].attr("ty")],
        SolverOptions(image_width=1920.0, profile_dir=trace_dir),
    )
    assert result.success
    found = []
    for root, _, files in os.walk(trace_dir):
        found += files
    assert found, "no trace files written"
