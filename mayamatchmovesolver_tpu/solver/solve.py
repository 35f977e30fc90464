"""Solve frontend: build a SolveProblem from scene objects, run LM,
write results back.

This is the counterpart of the reference's solve_v1/solve_v2 +
solveFrames drivers (ref: src/mmSolver/adjust/adjust_base.cpp:713-1580):
problem sizing and validation, frame-solve modes, accept-only-better
revert, and result assembly.  The hot loop itself is one jitted LM
program per problem shape (solver/lm.py).
"""

import dataclasses
import enum
import functools
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mayamatchmovesolver_tpu.scene.attrblock import AttrBlock
from mayamatchmovesolver_tpu.scene.scenegraph import Attribute
from mayamatchmovesolver_tpu.solver import lm as lm_mod
from mayamatchmovesolver_tpu.solver import problem as problem_mod
from mayamatchmovesolver_tpu.solver import results as results_mod
from mayamatchmovesolver_tpu.solver.loss import RobustLossType


class FrameSolveMode(enum.IntEnum):
    """(ref: FrameSolveMode, adjust_data.h:74-78.)"""

    ALL_FRAMES_AT_ONCE = 0
    PER_FRAME = 1


class SceneGraphMode(enum.IntEnum):
    """Kept for API parity with the reference's MayaDAG/MMSceneGraph flag
    (ref: adjust_data.h:80-84); this framework has one engine."""

    AUTO = 0
    FLAT_SCENE = 1


@dataclasses.dataclass
class SolverOptions:
    """Solver flags (ref: docs/source/commands_solve.rst:17-37 and
    SolverOptions, adjust_data.h:133-186)."""

    iterations: int = 20
    tau: float = 1e-3
    eps1: float = 1e-6  # gtol
    eps2: float = 1e-6  # xtol
    eps3: float = 1e-6  # ftol
    robust_loss_type: RobustLossType = RobustLossType.TRIVIAL
    robust_loss_scale: float = 1.0
    frame_solve_mode: FrameSolveMode = FrameSolveMode.ALL_FRAMES_AT_ONCE
    accept_only_better: bool = True
    image_width: float = 2048.0
    # 'fwd' Jacobian = n_params JVP passes; 'rev' = m VJP passes.
    jacobian_mode: str = "fwd"


def _lm_config(options: SolverOptions):
    return lm_mod.LMConfig(
        max_iterations=options.iterations,
        tau=options.tau,
        eps1=options.eps1,
        eps2=options.eps2,
        eps3=options.eps3,
        jacobian_mode=options.jacobian_mode,
    )


def build_problem(
    scene,
    attrs: AttrBlock,
    frame_indices: Sequence[int],
    solve_attrs: Sequence[Attribute],
    options: SolverOptions,
    marker_frame_mask=None,
    stiffness=None,
    lens=None,
) -> problem_mod.SolveProblem:
    """Expand Attribute handles into the flat parameter layout.

    Animated attrs contribute one parameter per solve frame; static
    attrs one parameter (ref: countUpNumberOfUnknownParameters,
    adjust_relationships.cpp:223).
    """
    frame_indices = np.asarray(frame_indices, dtype=np.int32)
    codes, frames, mins, maxs, offs, scales = [], [], [], [], [], []
    for attr in solve_attrs:
        if attr.code % 2 == 1:  # animated
            for f in frame_indices:
                codes.append(attr.code)
                frames.append(int(f))
                mins.append(attr.min_value)
                maxs.append(attr.max_value)
                offs.append(attr.offset_value)
                scales.append(attr.scale_value)
        else:
            codes.append(attr.code)
            frames.append(-1)
            mins.append(attr.min_value)
            maxs.append(attr.max_value)
            offs.append(attr.offset_value)
            scales.append(attr.scale_value)

    num_markers = scene.num_markers
    if marker_frame_mask is None:
        marker_frame_mask = np.ones(
            (num_markers, len(frame_indices)), dtype=bool
        )

    if stiffness is None:
        stiff = dict(codes=[], frames=[], weight=[], variance=[], target=[])
    else:
        stiff = stiffness

    dtype = attrs.static_values.dtype
    return problem_mod.SolveProblem(
        scene=scene,
        attrs=attrs,
        frame_indices=jnp.asarray(frame_indices),
        param_codes=jnp.asarray(codes, dtype=jnp.int32),
        param_frames=jnp.asarray(frames, dtype=jnp.int32),
        param_min=jnp.asarray(mins, dtype=dtype),
        param_max=jnp.asarray(maxs, dtype=dtype),
        param_offset=jnp.asarray(offs, dtype=dtype),
        param_scale=jnp.asarray(scales, dtype=dtype),
        stiff_codes=jnp.asarray(stiff["codes"], dtype=jnp.int32),
        stiff_frames=jnp.asarray(stiff["frames"], dtype=jnp.int32),
        stiff_weight=jnp.asarray(stiff["weight"], dtype=dtype),
        stiff_variance=jnp.asarray(
            stiff["variance"] or [], dtype=dtype
        ),
        stiff_target=jnp.asarray(stiff["target"], dtype=dtype),
        marker_frame_mask=jnp.asarray(marker_frame_mask),
        lens=lens,
        loss_type=int(options.robust_loss_type),
        loss_scale=float(options.robust_loss_scale),
        image_width=float(options.image_width),
    )


def build_stiffness(attrs_block, solve_attrs, frame_indices,
                    weight=1.0, variance=1.0, mode="stiffness"):
    """Build the stiffness/smoothness spec consumed by build_problem.

    Stiffness pulls each animated parameter toward its *previous
    frame's* value; smoothness toward the linear prediction from the
    two previous frames (ref: the attrStiffness/attrSmoothness solver
    flags and their target wiring, adjust_measureErrors.cpp:311-387,
    compile.py:486-589).  Targets are computed from the current attr
    values at build time.
    """
    import numpy as np

    anim = np.asarray(attrs_block.anim_values)
    codes, frames_out, weights, variances, targets = [], [], [], [], []
    frame_indices = list(frame_indices)
    for attr in solve_attrs:
        if attr.code % 2 != 1:
            continue
        channel = attr.code // 2
        for f in frame_indices:
            if mode == "stiffness":
                if f - 1 < 0:
                    continue
                target = anim[channel, f - 1]
            else:  # smoothness: linear prediction
                if f - 2 < 0:
                    continue
                target = 2.0 * anim[channel, f - 1] - anim[channel, f - 2]
            codes.append(attr.code)
            frames_out.append(int(f))
            weights.append(float(weight))
            variances.append(float(variance))
            targets.append(float(target))
    return dict(codes=codes, frames=frames_out, weight=weights,
                variance=variances, target=targets)


def count_errors_and_parameters(problem: problem_mod.SolveProblem):
    """Problem sizing, for validation
    (ref: countUpNumberOfErrors / countUpNumberOfUnknownParameters,
    adjust_relationships.cpp:75,223)."""
    num_marker_errors = int(np.sum(np.asarray(problem.marker_frame_mask))) * 2
    num_stiff = int(problem.stiff_codes.shape[0])
    return num_marker_errors + num_stiff, int(problem.num_params)


@functools.partial(jax.jit, static_argnums=1)
def _solve_problem_jit(problem, config_static_tuple):
    """One fully-fused solve.  config is rebuilt from a hashable tuple so
    the jit cache keys on solver settings."""
    (max_it, tau, eps1, eps2, eps3, jac_mode) = config_static_tuple
    config = lm_mod.LMConfig(
        max_iterations=max_it, tau=tau, eps1=eps1, eps2=eps2, eps3=eps3,
        jacobian_mode=jac_mode,
    )
    fn = problem_mod.residual_fn(problem)
    x0 = problem_mod.initial_parameters(problem)
    _, aux0 = problem_mod.measure_residuals(
        problem, problem.attrs
    )
    result = lm_mod.levenberg_marquardt(fn, x0, config)
    attrs_out = problem_mod.insert_parameters(problem, result.x)
    _, aux1 = problem_mod.measure_residuals(problem, attrs_out)
    return result, attrs_out, aux0, aux1


def solve(
    scene,
    attrs: AttrBlock,
    frame_indices: Sequence[int],
    solve_attrs: Sequence[Attribute],
    options: Optional[SolverOptions] = None,
    marker_frame_mask=None,
    stiffness=None,
    lens=None,
):
    """Solve and return (new_attrs, SolverResult).

    Equivalent of one mmSolver command invocation
    (ref: MMSolverCmd::doIt -> solve_v1, MMSolverCmd.cpp:109,
    adjust_base.cpp:1297).
    """
    options = options or SolverOptions()
    problem = build_problem(
        scene, attrs, frame_indices, solve_attrs, options,
        marker_frame_mask=marker_frame_mask, stiffness=stiffness,
        lens=lens,
    )

    num_errors, num_params = count_errors_and_parameters(problem)
    result = results_mod.SolverResult()
    if num_params == 0 or num_errors < num_params:
        # (ref: adjust_base.cpp:864-882 — errors >= parameters required.)
        result.success = False
        result.reason_string = (
            "cannot solve: %d errors < %d parameters"
            % (num_errors, num_params)
        )
        return attrs, result

    cfg = (
        int(options.iterations),
        float(options.tau),
        float(options.eps1),
        float(options.eps2),
        float(options.eps3),
        options.jacobian_mode,
    )

    t0 = time.perf_counter()
    lm_result, attrs_out, aux0, aux1 = _solve_problem_jit(problem, cfg)
    jax.block_until_ready(lm_result.x)
    solve_seconds = time.perf_counter() - t0

    error_initial = float(aux0["error_avg"])
    error_final = float(aux1["error_avg"])

    reverted = False
    if options.accept_only_better and not (error_final < error_initial):
        # (ref: acceptOnlyBetter revert, adjust_base.cpp:1208-1244.)
        attrs_out = attrs
        error_final = error_initial
        aux1 = aux0
        reverted = True

    result.success = bool(int(lm_result.stop_reason) in (1, 2, 3, 4))
    result.stop_reason = int(lm_result.stop_reason)
    result.reason_string = results_mod.STOP_REASON_MESSAGES.get(
        result.stop_reason, ""
    )
    if reverted:
        result.reason_string += " (reverted: no improvement)"
    result.iterations = int(lm_result.iterations)
    result.function_evals = int(lm_result.func_evals)
    result.jacobian_evals = int(lm_result.jacobian_evals)
    result.error_initial = error_initial
    result.error_final = error_final
    result.error_avg = float(aux1["error_avg"])
    result.error_min = float(aux1["error_min"])
    result.error_max = float(aux1["error_max"])
    result.timer.solve_seconds = solve_seconds
    result.solved_parameters = np.asarray(lm_result.x)

    # Per-frame average deviation.
    dist = np.asarray(aux1["per_marker_frame_distance"])  # (M, F)
    mask = np.asarray(aux1["mask"])
    frames = [int(f) for f in np.asarray(problem.frame_indices)]
    per_frame = []
    for fi in range(len(frames)):
        m = mask[:, fi]
        per_frame.append(
            float(dist[:, fi][m].mean()) if m.any() else float("nan")
        )
    result.per_frame_error = results_mod.FrameErrorList(
        frames=frames, errors=per_frame
    )
    # Per-marker deviation curves (the reference bakes these onto the
    # marker nodes for the "Show Deviation Curves" tool).
    for mi in range(dist.shape[0]):
        fl = results_mod.FrameErrorList()
        for fi, frame in enumerate(frames):
            if mask[mi, fi]:
                fl.frames.append(frame)
                fl.errors.append(float(dist[mi, fi]))
        result.per_marker_error["marker_%d" % mi] = fl
    return attrs_out, result


@functools.partial(jax.jit, static_argnums=2)
def _solve_per_frame_jit(base, frame_indices, config_static_tuple):
    """The whole per-frame sweep as ONE program: vmapped LM over frames,
    vectorized scatter of the solutions into the attr block, and the
    final deviation measurement — a single dispatch (the remote-device
    round-trip otherwise dominates wall-clock)."""
    (max_it, tau, eps1, eps2, eps3, jac_mode) = config_static_tuple
    config = lm_mod.LMConfig(
        max_iterations=max_it, tau=tau, eps1=eps1, eps2=eps2, eps3=eps3,
        jacobian_mode=jac_mode,
    )

    def solve_one(frame_idx):
        prob = dataclasses.replace(
            base,
            frame_indices=frame_idx[None],
            param_frames=jnp.broadcast_to(
                frame_idx, base.param_frames.shape
            ),
        )
        fn = problem_mod.residual_fn(prob)
        x0 = problem_mod.initial_parameters(prob)
        return lm_mod.levenberg_marquardt(fn, x0, config)

    batched = jax.vmap(solve_one)(frame_indices)

    # Vectorized scatter: all parameters are animated, so solution
    # (F, P) writes to anim[channel_p, frame_f] after bound conversion.
    from mayamatchmovesolver_tpu.solver import bounds as bounds_mod

    external = bounds_mod.internal_to_external(
        batched.x,
        base.param_min[None, :],
        base.param_max[None, :],
        base.param_offset[None, :],
        base.param_scale[None, :],
    )  # (F, P)
    channels = base.param_codes // 2  # (P,) all animated
    anim_new = base.attrs.anim_values.at[
        channels[None, :], frame_indices[:, None]
    ].set(external.astype(base.attrs.anim_values.dtype))
    attrs_out = base.attrs._replace(anim_values=anim_new)

    final_prob = dataclasses.replace(
        base,
        attrs=attrs_out,
        frame_indices=frame_indices,
        marker_frame_mask=jnp.broadcast_to(
            base.marker_frame_mask[:, :1],
            (base.scene.num_markers, frame_indices.shape[0]),
        ),
    )
    _, aux = problem_mod.measure_residuals(final_prob, attrs_out)
    return attrs_out, batched, aux


def solve_per_frame(
    scene,
    attrs: AttrBlock,
    frame_indices: Sequence[int],
    solve_attrs: Sequence[Attribute],
    options: Optional[SolverOptions] = None,
    lens=None,
    marker_mask=None,
):
    """Per-frame solve mode: each frame is an independent problem.

    The reference loops frames serially because the Maya DG is not
    thread-safe (ref: adjust_base.cpp:1430-1484); here all frames solve
    *in parallel* under one vmap-ped LM — the per-frame problems share
    one compiled program and batch onto the TPU.

    Only animated attributes are meaningful per-frame; static attrs
    would be re-solved per frame (the reference has the same semantics —
    later frames overwrite earlier results).
    """
    options = options or SolverOptions()
    frame_indices = np.asarray(frame_indices, dtype=np.int32)
    anim_attrs = [a for a in solve_attrs if a.code % 2 == 1]
    if len(anim_attrs) != len(solve_attrs):
        raise ValueError(
            "per-frame solve supports animated attributes only; "
            "solve static attrs in ALL_FRAMES_AT_ONCE mode"
        )

    mask1 = None
    if marker_mask is not None:
        mask1 = np.broadcast_to(
            np.asarray(marker_mask, dtype=bool)[:, None],
            (scene.num_markers, 1),
        )
    base = build_problem(
        scene, attrs, frame_indices[:1], anim_attrs, options, lens=lens,
        marker_frame_mask=mask1,
    )
    cfg = (
        int(options.iterations),
        float(options.tau),
        float(options.eps1),
        float(options.eps2),
        float(options.eps3),
        options.jacobian_mode,
    )

    t0 = time.perf_counter()
    attrs_out, batched, aux = _solve_per_frame_jit(
        base, jnp.asarray(frame_indices), cfg
    )
    jax.block_until_ready(attrs_out.anim_values)
    solve_seconds = time.perf_counter() - t0

    result = results_mod.SolverResult()
    result.success = True
    result.iterations = int(np.max(np.asarray(batched.iterations)))
    result.function_evals = int(np.sum(np.asarray(batched.func_evals)))
    result.jacobian_evals = int(np.sum(np.asarray(batched.jacobian_evals)))
    result.error_final = float(aux["error_avg"])
    result.error_avg = float(aux["error_avg"])
    result.error_min = float(aux["error_min"])
    result.error_max = float(aux["error_max"])
    result.timer.solve_seconds = solve_seconds
    return attrs_out, result
