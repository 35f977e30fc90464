"""Result serialization, checkpoint, registry, logger tests (host-side)."""

import os

import numpy as np

from mayamatchmovesolver_tpu.solver import checkpoint, registry, results


def test_key_value_round_trip():
    r = results.SolverResult()
    r.success = True
    r.stop_reason = 1
    r.error_initial = 12.5
    r.error_final = 0.03
    r.iterations = 7
    r.per_frame_error = results.FrameErrorList(
        frames=[1, 2], errors=[0.05, 0.01]
    )
    lines = r.as_key_value_strings()
    assert lines[0] == "success=1"
    parsed = results.parse_key_value_strings(lines)
    assert parsed["success"] == "1"
    assert float(parsed["error_final"]) == 0.03
    assert parsed["per_frame_error"] == {1: 0.05, 2: 0.01}


def test_checkpoint_round_trip(tmp_path):
    import jax.numpy as jnp

    from mayamatchmovesolver_tpu.scene.attrblock import AttrBlock

    attrs = AttrBlock(
        static_values=jnp.asarray([1.0, 2.0]),
        anim_values=jnp.asarray([[1.0, 2.0, 3.0]]),
    )
    path = os.path.join(tmp_path, "state.npz")
    checkpoint.save_solve_state(
        path, attrs, params=np.array([0.5]), iteration=3, cost=1.25
    )
    attrs2, params, meta = checkpoint.load_solve_state(path)
    np.testing.assert_array_equal(
        np.asarray(attrs2.static_values), [1.0, 2.0]
    )
    np.testing.assert_array_equal(params, [0.5])
    assert meta["iteration"] == 3
    assert meta["cost"] == 1.25


def test_solver_registry():
    types = registry.get_solver_types()
    names = [n for _, n in types]
    assert "lm_jax" in names
    assert "ba_schur" in names
    idx, name = registry.get_solver_type_default()
    assert name == "lm_jax"

    os.environ[registry.DEFAULT_SOLVER_ENV_VAR] = "ba_schur"
    try:
        idx, name = registry.get_solver_type_default()
        assert name == "ba_schur"
    finally:
        del os.environ[registry.DEFAULT_SOLVER_ENV_VAR]


def test_logger_levels():
    from mayamatchmovesolver_tpu.utils.logger import (
        LogLevel,
        get_logger,
        set_log_level,
    )

    # Numeric parity with the reference's LogLevel enum
    # (adjust_data.h:93-100).
    assert LogLevel.ERROR == 0
    assert LogLevel.DEBUG == 4
    log = get_logger("mmsolver_tpu.test")
    set_log_level("debug")
    log.debug("debug message visible")
    set_log_level(LogLevel.INFO)


def test_ba_state_checkpoint_roundtrip(tmp_path):
    """BAState save/load resumes a BA mid-solve exactly: run 3 blocks,
    checkpoint after 1, resume from disk, and match the uninterrupted
    run (the BA counterpart of the LM block checkpoint)."""
    import jax
    import jax.numpy as jnp

    from mayamatchmovesolver_tpu.solver import ba, checkpoint

    rng = np.random.RandomState(2)
    num_frames, num_bundles = 6, 8
    cam_true = np.zeros((num_frames, 6))
    cam_true[:, 0] = np.linspace(-1, 1, num_frames)
    cam_true[:, 2] = 9.0
    bnd_true = np.stack([
        rng.uniform(-3, 3, num_bundles),
        rng.uniform(-2, 2, num_bundles),
        rng.uniform(-7, -3, num_bundles),
    ], axis=-1)
    problem0 = ba.make_ba_problem(
        marker_uv=np.zeros((num_bundles, num_frames, 2)),
        weight=np.ones((num_bundles, num_frames)),
        mkr_bnd_index=np.arange(num_bundles),
        cam_params=cam_true, bnd_params=bnd_true,
    )
    r = ba.ba_residuals(problem0, jnp.asarray(cam_true),
                        jnp.asarray(bnd_true))
    problem = problem0._replace(
        marker_uv=jnp.asarray(-np.asarray(r) / problem0.image_width),
        cam_params=jnp.asarray(
            cam_true + rng.normal(0, 0.05, cam_true.shape)
        ),
    )

    state = ba.ba_init(problem)
    state1 = ba.ba_run_block(problem, state, 4, max_iterations=12)
    path = str(tmp_path / "ba_state.npz")
    checkpoint.save_ba_state(path, state1, metadata={"block": 1})
    loaded, meta = checkpoint.load_ba_state(path)
    assert meta["block"] == 1
    for f in state1._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(loaded, f)),
            np.asarray(getattr(state1, f)),
        )
    resumed = ba.ba_run_block(problem, loaded, 12, max_iterations=12)
    straight = ba.ba_run_block(problem, state, 12, max_iterations=12)
    np.testing.assert_allclose(
        np.asarray(resumed.cam), np.asarray(straight.cam), atol=1e-12
    )
    assert int(resumed.it) == int(straight.it)
