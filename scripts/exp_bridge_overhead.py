"""Config #4 (product-path lens+focal BA) host-side breakdown
(VERDICT r4 weak #4): where does the per-solve wall time go —
problem build, bridge classification, the fused device solve, the
deviation measurement, or result assembly?"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _synthetic_tracked_scene  # noqa: E402


def main():
    import importlib

    import jax
    import jax.numpy as jnp

    from mayamatchmovesolver_tpu.solver import (
        SolverOptions, registry, solve,
    )
    from mayamatchmovesolver_tpu.solver import ba as ba_lib
    from mayamatchmovesolver_tpu.solver import ba_bridge

    solve_mod = importlib.import_module(
        "mayamatchmovesolver_tpu.solver.solve"
    )

    num_frames, num_bundles = 30, 20
    scene, attrs, sg, cam, bundles, lens = _synthetic_tracked_scene(
        num_frames, num_bundles, lens_distortion=0.1, seed=11
    )
    anim = np.array(attrs.anim_values)
    for ch, delta in [("tx", 0.1), ("ry", -0.8)]:
        anim[cam.attr(ch).code // 2] += delta
    static = np.array(attrs.static_values)
    static[cam.attr("focal_length_mm").code // 2] += 1.5
    static[cam.attr("lens_distortion").code // 2] -= 0.04
    attrs = attrs._replace(anim_values=jnp.asarray(anim),
                           static_values=jnp.asarray(static))
    solve_attrs = [cam.attr(c) for c in ("tx", "ty", "tz",
                                         "rx", "ry", "rz")]
    for b in bundles:
        solve_attrs += [b.attr(c) for c in ("tx", "ty", "tz")]
    solve_attrs += [cam.attr("focal_length_mm"),
                    cam.attr("lens_distortion")]
    options = SolverOptions(iterations=25, image_width=1920.0,
                            accept_only_better=False,
                            solver_type=registry.SOLVER_TYPE_BA_SCHUR)

    # Warm everything.
    _, result = solve(scene, attrs, np.arange(num_frames), solve_attrs,
                      options, lens=lens)
    assert result.solver_type_name == "ba_schur"

    runs = 4
    t0 = time.perf_counter()
    for _ in range(runs):
        _, result = solve(scene, attrs, np.arange(num_frames),
                          solve_attrs, options, lens=lens)
    t_total = (time.perf_counter() - t0) / runs

    t0 = time.perf_counter()
    for _ in range(runs):
        problem = solve_mod.build_problem(
            scene, attrs, np.arange(num_frames), solve_attrs, options,
            lens=lens)
    t_build = (time.perf_counter() - t0) / runs

    t0 = time.perf_counter()
    for _ in range(runs):
        bridge, reason = ba_bridge.build_ba_bridge(
            scene, attrs, np.arange(num_frames), solve_attrs, options,
            lens=lens)
    t_bridge = (time.perf_counter() - t0) / runs

    cfg = (25, 1e-3, 1e-6, 1e-6, 1e-6, "cholesky", 30)
    out = solve_mod._ba_solve_jit(bridge.problem, cfg)
    jax.block_until_ready(out.cam_params)
    t0 = time.perf_counter()
    for _ in range(runs):
        out = solve_mod._ba_solve_jit(bridge.problem, cfg)
        jax.block_until_ready(out.cam_params)
    t_device = (time.perf_counter() - t0) / runs

    attrs_out = bridge.apply_result(problem.attrs, out)
    m = solve_mod._measure_pair_jit(problem, problem.attrs, attrs_out)
    jax.block_until_ready(m[0]["error_avg"])
    t0 = time.perf_counter()
    for _ in range(runs):
        m = solve_mod._measure_pair_jit(problem, problem.attrs,
                                        attrs_out)
        jax.block_until_ready(m[0]["error_avg"])
    t_measure = (time.perf_counter() - t0) / runs

    print(json.dumps({
        "t_total_ms": round(t_total * 1e3, 1),
        "t_build_problem_ms": round(t_build * 1e3, 1),
        "t_bridge_classify_ms": round(t_bridge * 1e3, 1),
        "t_device_solve_ms": round(t_device * 1e3, 1),
        "t_measure_pair_ms": round(t_measure * 1e3, 1),
        "t_rest_assembly_ms": round(
            (t_total - t_build - t_bridge - t_device - t_measure)
            * 1e3, 1),
        "its_per_s": round(25.0 / t_total, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
