"""Round-5 experiment: headline pose-solve throughput vs matmul
precision (VERDICT r4 weak #1 — the 5,449 -> 3,115 it/s regression).

Runs the bench headline config (#2, 50-frame per-frame pose solve)
under the precision selected by MMSOLVER_TPU_MATMUL_PRECISION and
prints one JSON line with it/s, compile time, and solution quality
(error_final must stay at round-off for the variant to be eligible).

Usage (from /root/repo, TPU backend):
    MMSOLVER_TPU_MATMUL_PRECISION=float32        python scripts/exp_precision.py
    MMSOLVER_TPU_MATMUL_PRECISION=tensorfloat32  python scripts/exp_precision.py
    MMSOLVER_TPU_MATMUL_PRECISION=default        python scripts/exp_precision.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _pose_scene  # noqa: E402


def main():
    variant = os.environ.get("MMSOLVER_TPU_MATMUL_PRECISION", "<unset>")
    import jax

    from mayamatchmovesolver_tpu.solver import SolverOptions, solve_per_frame

    platform = jax.devices()[0].platform
    scene, attrs, solve_attrs = _pose_scene(50)
    options = SolverOptions(
        iterations=20, image_width=1920.0, accept_only_better=False,
        eps1=0.0, eps2=0.0, eps3=0.0,
    )
    t0 = time.perf_counter()
    _, result = solve_per_frame(
        scene, attrs, np.arange(50), solve_attrs, options
    )
    compile_s = time.perf_counter() - t0

    runs = 5
    total_iters = 0
    t0 = time.perf_counter()
    for _ in range(runs):
        _, result = solve_per_frame(
            scene, attrs, np.arange(50), solve_attrs, options
        )
        total_iters += result.iterations * 50
    elapsed = time.perf_counter() - t0
    print(json.dumps({
        "variant": variant,
        "platform": platform,
        "its_per_s": round(total_iters / elapsed, 1),
        "compile_s": round(compile_s, 1),
        "error_initial": float(result.error_initial),
        "error_final": float(result.error_final),
    }), flush=True)


if __name__ == "__main__":
    main()
