"""Chip ceilings measured with DEPENDENT op chains (a remote runtime
can elide or overlap repeated identical dispatches; a chain's final
block_until_ready cannot complete without executing every step)."""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    results = {"device": str(jax.devices()[0])}

    # Dense matmul chain: x_{k+1} = normalize(x_k @ b).
    n = 2048
    k = 32
    b = jnp.asarray(np.random.rand(n, n).astype(np.float32) / n)

    @jax.jit
    def chain(x):
        def body(_, x):
            y = x @ b
            return y / (jnp.max(jnp.abs(y)) + 1e-9)
        return jax.lax.fori_loop(0, k, body, x)

    x0 = jnp.asarray(np.random.rand(n, n).astype(np.float32))
    y = chain(x0)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    y = chain(y)
    jax.block_until_ready(y)
    t = time.perf_counter() - t0
    results["matmul_chain_default_tflops"] = round(
        k * 2 * n**3 / t / 1e12, 2)

    @jax.jit
    def chain_f32(x):
        def body(_, x):
            y = jnp.matmul(x, b, precision=jax.lax.Precision.HIGHEST)
            return y / (jnp.max(jnp.abs(y)) + 1e-9)
        return jax.lax.fori_loop(0, k, body, x)

    y = chain_f32(x0)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    y = chain_f32(y)
    jax.block_until_ready(y)
    t = time.perf_counter() - t0
    results["matmul_chain_f32_tflops"] = round(
        k * 2 * n**3 / t / 1e12, 2)

    # Elementwise chain (VPU): ~8 flops per element per step.
    m = 1 << 24
    kk = 64
    v0 = jnp.asarray(np.random.rand(m).astype(np.float32))

    @jax.jit
    def ew_chain(v):
        def body(_, v):
            return jnp.sin(v) * 1.0001 + v * v * 0.1 - 0.05
        return jax.lax.fori_loop(0, kk, body, v)

    y = ew_chain(v0)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    y = ew_chain(y)
    jax.block_until_ready(y)
    t = time.perf_counter() - t0
    results["elementwise_chain_gflops_at_8flop"] = round(
        8.0 * kk * m / t / 1e9, 1)

    # Bandwidth: chained roll-add over a big buffer (read+write each
    # step, no fusion across steps possible due to the data hazard).
    w = 1 << 26

    @jax.jit
    def bw_chain(v):
        def body(_, v):
            return jnp.roll(v, 1) + 1.0
        return jax.lax.fori_loop(0, 16, body, v)

    vb = jnp.asarray(np.random.rand(w).astype(np.float32))
    y = bw_chain(vb)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    y = bw_chain(y)
    jax.block_until_ready(y)
    t = time.perf_counter() - t0
    results["hbm_chain_gbytes_per_s"] = round(16 * 2 * 4 * w / t / 1e9, 1)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
