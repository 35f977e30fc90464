"""Measure this chip's actual ceilings: dense matmul (MXU, bf16-pass
and f32-accumulated), elementwise transcendental throughput (VPU), and
HBM copy bandwidth — the anchors for the BA roofline note in
BASELINE.md (spec-sheet numbers do not apply to this tunneled chip)."""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    results = {"platform": jax.devices()[0].platform,
               "device": str(jax.devices()[0])}
    n = 4096
    a = jnp.asarray(np.random.rand(n, n).astype(np.float32))
    b = jnp.asarray(np.random.rand(n, n).astype(np.float32))

    mm_default = jax.jit(lambda x, y: x @ y)
    t = timeit(mm_default, a, b)
    results["matmul_4096_default_tflops"] = round(2 * n**3 / t / 1e12, 2)

    mm_f32 = jax.jit(lambda x, y: jnp.matmul(
        x, y, precision=jax.lax.Precision.HIGHEST))
    t = timeit(mm_f32, a, b)
    results["matmul_4096_f32_tflops"] = round(2 * n**3 / t / 1e12, 2)

    ab = a.astype(jnp.bfloat16)
    bb = b.astype(jnp.bfloat16)
    mm_bf16 = jax.jit(lambda x, y: x @ y)
    t = timeit(mm_bf16, ab, bb)
    results["matmul_4096_bf16_tflops"] = round(2 * n**3 / t / 1e12, 2)

    # VPU: fused elementwise chain (~10 flops/element incl. 1 transcendental).
    m = 1 << 26  # 64M elements, 256 MB
    v = jnp.asarray(np.random.rand(m).astype(np.float32))
    ew = jax.jit(lambda x: jnp.sin(x) * x + x * x - 0.5 * x)
    t = timeit(ew, v)
    results["elementwise_gflops_at_10flop_per_elt"] = round(
        10 * m / t / 1e9, 1)

    # HBM copy bandwidth (read+write).
    cp = jax.jit(lambda x: x + 1.0)
    t = timeit(cp, v)
    results["hbm_copy_gbytes_per_s"] = round(2 * 4 * m / t / 1e9, 1)

    # K=4 batched small matmul (the BA reprojection shape):
    # (F,4,4) x (F,4,M) per frame.
    f, mm_ = 1024, 2048
    q = jnp.asarray(np.random.rand(f, 4, 4).astype(np.float32))
    x = jnp.asarray(np.random.rand(f, 4, mm_).astype(np.float32))
    small = jax.jit(lambda q_, x_: jnp.einsum("fij,fjm->fim", q_, x_))
    t = timeit(small, q, x)
    results["batched_4x4xM_gflops"] = round(
        2 * f * 4 * 4 * mm_ / t / 1e9, 1)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
