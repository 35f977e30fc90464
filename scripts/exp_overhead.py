"""Round-5 experiment #2: split the headline config's wall-clock into
(a) the fused _solve_per_frame_jit device program and (b) the host-side
result assembly / transfers in solve_per_frame (remote-tunnel
transfers are suspected to dominate the 5,449 -> 3,115 it/s drop)."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _pose_scene  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    import importlib

    from mayamatchmovesolver_tpu.solver import SolverOptions, solve_per_frame

    solve_mod = importlib.import_module(
        "mayamatchmovesolver_tpu.solver.solve"
    )

    scene, attrs, solve_attrs = _pose_scene(50)
    options = SolverOptions(
        iterations=20, image_width=1920.0, accept_only_better=False,
        eps1=0.0, eps2=0.0, eps3=0.0,
    )
    frame_indices = np.arange(50, dtype=np.int32)

    # Full path (compile + 5 runs).
    _, result = solve_per_frame(scene, attrs, frame_indices, solve_attrs,
                                options)
    runs = 5
    t0 = time.perf_counter()
    for _ in range(runs):
        _, result = solve_per_frame(scene, attrs, frame_indices,
                                    solve_attrs, options)
    t_full = (time.perf_counter() - t0) / runs

    # Raw jitted program only (same shapes; compiled above).
    base = solve_mod.build_problem(
        scene, attrs, frame_indices[:1], solve_attrs, options
    )
    cfg = (20, float(options.tau), 0.0, 0.0, 0.0, options.jacobian_mode)
    full_mask = jnp.ones((scene.num_markers, 50), bool)
    fidx = jnp.asarray(frame_indices)
    out = solve_mod._solve_per_frame_jit(base, fidx, full_mask, cfg, False)
    jax.block_until_ready(out[0].anim_values)
    t0 = time.perf_counter()
    for _ in range(runs):
        out = solve_mod._solve_per_frame_jit(base, fidx, full_mask, cfg,
                                             False)
        jax.block_until_ready(out[0].anim_values)
    t_jit = (time.perf_counter() - t0) / runs

    # Device program + ONE blocking fetch of everything (tree transfer).
    t0 = time.perf_counter()
    for _ in range(runs):
        out = solve_mod._solve_per_frame_jit(base, fidx, full_mask, cfg,
                                             False)
        fetched = jax.device_get(out)
    t_fetch = (time.perf_counter() - t0) / runs

    print(json.dumps({
        "t_full_s": round(t_full, 4),
        "t_jit_s": round(t_jit, 4),
        "t_jit_plus_tree_fetch_s": round(t_fetch, 4),
        "host_overhead_s": round(t_full - t_jit, 4),
        "its_per_s_full": round(1000.0 / t_full, 1),
        "its_per_s_jit": round(1000.0 / t_jit, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
