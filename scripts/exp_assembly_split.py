"""Which part of assemble_normal_blocks dominates at production
scale: the residual+Jacobian tensors (AD vs analytic) or the block
einsum reductions?"""

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
        rb_analytic = jax.jit(lambda p: ba._residual_and_blocks_analytic(
            p, p.cam_params, p.bnd_params, sh))
        rb_ad = jax.jit(lambda p: ba._residual_and_blocks_ad(
            p, p.cam_params, p.bnd_params, sh))
        full = jax.jit(lambda p: ba.assemble_normal_blocks(
            p, p.cam_params, p.bnd_params, sh))
        t_an = timeit(rb_analytic, problem)
        t_ad = timeit(rb_ad, problem)
        t_full = timeit(full, problem)

    print(json.dumps({
        "F": F, "B": B,
        "t_residjac_analytic_ms": round(t_an * 1e3, 1),
        "t_residjac_ad_ms": round(t_ad * 1e3, 1),
        "t_assemble_full_ms": round(t_full * 1e3, 1),
        "t_block_einsums_ms": round((t_full - t_an) * 1e3, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
