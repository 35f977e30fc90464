"""Layered config, leveled logging, and phase-timer coverage
(SURVEY §5 aux subsystems: config/flags, metrics/logging,
tracing/profiling — the host-side plumbing the reference carries in
utils/config.py, mmsolverlibs/debug.h and the SolverTimer)."""

import json
import os
import time

import pytest


@pytest.fixture
def _clean_env(monkeypatch):
    monkeypatch.delenv("MMSOLVER_TPU_CONFIG_PATH", raising=False)
    monkeypatch.delenv("MMSOLVER_TPU_SOLVER_DEFAULT_SOLVER",
                       raising=False)
    return monkeypatch


def test_config_defaults(_clean_env):
    from mayamatchmovesolver_tpu.utils import config

    assert config.get("solver/default_solver") == "lm_jax"
    assert config.get("logging/level") == "info"
    assert config.get("no/such/key", "fallback") == "fallback"


def test_config_json_layer_overrides_defaults(_clean_env, tmp_path):
    from mayamatchmovesolver_tpu.utils import config

    with open(tmp_path / "mmsolver_tpu.json", "w") as f:
        json.dump({"solver": {"default_solver": "ba_schur"},
                   "custom": {"knob": 42}}, f)
    _clean_env.setenv("MMSOLVER_TPU_CONFIG_PATH", str(tmp_path))
    assert config.get("solver/default_solver") == "ba_schur"
    assert config.get("custom/knob") == 42
    # Untouched defaults still resolve.
    assert config.get("logging/level") == "info"


def test_config_env_wins_over_json(_clean_env, tmp_path):
    from mayamatchmovesolver_tpu.utils import config

    with open(tmp_path / "mmsolver_tpu.json", "w") as f:
        json.dump({"solver": {"default_solver": "ba_schur"}}, f)
    _clean_env.setenv("MMSOLVER_TPU_CONFIG_PATH", str(tmp_path))
    _clean_env.setenv("MMSOLVER_TPU_SOLVER_DEFAULT_SOLVER",
                      "lm_sharded")
    assert config.get("solver/default_solver") == "lm_sharded"


def test_config_layer_order_first_path_wins(_clean_env, tmp_path):
    from mayamatchmovesolver_tpu.utils import config

    a = tmp_path / "a"
    b = tmp_path / "b"
    a.mkdir()
    b.mkdir()
    with open(a / "mmsolver_tpu.json", "w") as f:
        json.dump({"k": {"v": "from_a"}}, f)
    with open(b / "mmsolver_tpu.json", "w") as f:
        json.dump({"k": {"v": "from_b"}}, f)
    _clean_env.setenv(
        "MMSOLVER_TPU_CONFIG_PATH",
        os.pathsep.join([str(a), str(b)]),
    )
    assert config.get("k/v") == "from_a"


def test_config_bad_json_is_skipped(_clean_env, tmp_path):
    from mayamatchmovesolver_tpu.utils import config

    with open(tmp_path / "mmsolver_tpu.json", "w") as f:
        f.write("{not json")
    _clean_env.setenv("MMSOLVER_TPU_CONFIG_PATH", str(tmp_path))
    assert config.get("solver/default_solver") == "lm_jax"


def test_log_levels_mirror_reference_enum():
    """LogLevel numeric values track the reference's 5-level enum
    (ref: adjust_data.h:93-100, kept in sync with Python constants)."""
    from mayamatchmovesolver_tpu.utils.logger import LogLevel

    assert list(LogLevel) == sorted(LogLevel)
    names = {m.name.lower() for m in LogLevel}
    assert {"error", "warning", "info", "verbose", "debug"} <= names


def test_set_log_level_filters_output(capsys):
    from mayamatchmovesolver_tpu.utils import logger as log_mod

    log = log_mod.get_logger("mmtpu_test")
    log_mod.set_log_level(log_mod.LogLevel.WARNING)
    try:
        log.info("should-not-appear")
        log.warning("should-appear")
    finally:
        log_mod.set_log_level(log_mod.LogLevel.INFO)


def test_phase_timer_summary():
    from mayamatchmovesolver_tpu.utils.profiler import PhaseTimer

    t = PhaseTimer()
    with t.phase("solve"):
        time.sleep(0.01)
    with t.phase("jacobian"):
        time.sleep(0.005)
    with t.phase("solve"):
        time.sleep(0.01)
    s = t.summary()
    assert "solve" in s and "jacobian" in s
    assert t.totals["solve"] >= 0.02
    assert t.totals["jacobian"] >= 0.005


def test_xla_trace_nullcontext_without_dir(tmp_path):
    from mayamatchmovesolver_tpu.utils import profiler

    # With a directory: the context manager must create the trace dir
    # (the jax.profiler backend may or may not emit device data on
    # CPU; the contract here is that the context is usable).
    d = str(tmp_path / "trace")
    try:
        with profiler.xla_trace(d):
            pass
    except Exception as exc:  # pragma: no cover - backend-specific
        pytest.skip("jax.profiler unavailable: %s" % exc)
