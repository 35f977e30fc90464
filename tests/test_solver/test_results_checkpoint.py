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
