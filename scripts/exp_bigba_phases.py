"""Phase split of the production-scale BA iteration on the real TPU:
block assembly vs cost-only eval vs the CG solve, for the roofline
note (VERDICT r4 weak #2)."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from mayamatchmovesolver_tpu.solver import ba

    F = int(os.environ.get("BIGBA_F", "1024"))
    B = int(os.environ.get("BIGBA_B", "2048"))

    rng = np.random.RandomState(3)
    cam = np.zeros((F, 6), np.float32)
    cam[:, 0] = np.linspace(-4, 4, F)
    cam[:, 2] = 12.0
    bnd = np.stack([rng.uniform(-6, 6, B), rng.uniform(-3, 3, B),
                    rng.uniform(-10, -3, B)], -1).astype(np.float32)
    problem = ba.make_ba_problem(
        marker_uv=rng.rand(B, F, 2).astype(np.float32) * 0.1,
        weight=np.ones((B, F), np.float32),
        mkr_bnd_index=np.arange(B),
        cam_params=cam, bnd_params=bnd,
        solve_focal=True,
        lens_model_type="tde_classic",
        lens_params=dict(distortion=0.08),
        lens_solve_names=["distortion"],
    )
    sh = jnp.asarray([35.0, 0.08], np.float32)

    def timeit(fn, *args, n=3):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
            jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n

    with jax.default_matmul_precision("float32"):
        assemble = jax.jit(lambda p: ba.assemble_normal_blocks(
            p, p.cam_params, p.bnd_params, sh))
        cost_only = jax.jit(lambda p: ba.ba_cost(
            p, p.cam_params, p.bnd_params, sh))
        step = jax.jit(lambda p: ba._schur_cg_step(
            p, p.cam_params, p.bnd_params, sh,
            jnp.asarray(1e-3, np.float32), 30))
        t_assemble = timeit(assemble, problem)
        t_cost = timeit(cost_only, problem)
        t_step = timeit(step, problem)

    print(json.dumps({
        "F": F, "B": B,
        "t_assemble_ms": round(t_assemble * 1e3, 1),
        "t_cost_only_ms": round(t_cost * 1e3, 1),
        "t_full_step_ms": round(t_step * 1e3, 1),
        "t_cg_and_schur_ms": round((t_step - t_assemble) * 1e3, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
