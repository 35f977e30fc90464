"""LM core unit tests (small, few compiles)."""

import jax
import jax.numpy as jnp
import numpy as np

from mayamatchmovesolver_tpu.solver import lm as lm_mod
from mayamatchmovesolver_tpu.solver import linalg


def test_cholesky_solve_matches_numpy():
    rng = np.random.RandomState(42)
    m = rng.randn(7, 7)
    a = m @ m.T + 7 * np.eye(7)
    b = rng.randn(7)
    x = np.asarray(linalg.solve_spd(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(x, np.linalg.solve(a, b), atol=1e-9)


def test_cholesky_factor_matches_numpy():
    rng = np.random.RandomState(3)
    m = rng.randn(5, 5)
    a = m @ m.T + 5 * np.eye(5)
    l = np.asarray(linalg.cholesky(jnp.asarray(a)))
    np.testing.assert_allclose(l, np.linalg.cholesky(a), atol=1e-9)


def test_lm_converges_linear_least_squares():
    """On a linear problem LM must reach the normal-equation solution."""
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(20, 4))
    b = jnp.asarray(rng.randn(20))

    def residual(x):
        return a @ x - b

    result = lm_mod.levenberg_marquardt(
        residual, jnp.zeros(4), lm_mod.LMConfig(max_iterations=50)
    )
    expect = np.linalg.lstsq(np.asarray(a), np.asarray(b), rcond=None)[0]
    np.testing.assert_allclose(np.asarray(result.x), expect, atol=1e-6)
    assert int(result.stop_reason) in (1, 2, 3)


def test_lm_converges_rosenbrock():
    def residual(x):
        return jnp.stack([10.0 * (x[1] - x[0] ** 2), 1.0 - x[0]])

    result = lm_mod.levenberg_marquardt(
        residual,
        jnp.asarray([-1.2, 1.0]),
        lm_mod.LMConfig(max_iterations=200),
    )
    np.testing.assert_allclose(np.asarray(result.x), [1.0, 1.0], atol=1e-5)


def test_lm_is_jittable():
    def residual(x):
        return jnp.stack([x[0] - 3.0, 2.0 * (x[1] + 1.0)])

    jitted = jax.jit(
        lambda x0: lm_mod.levenberg_marquardt(residual, x0)
    )
    result = jitted(jnp.zeros(2))
    np.testing.assert_allclose(np.asarray(result.x), [3.0, -1.0], atol=1e-8)


def test_blocked_cholesky_matches_numpy():
    """The blocked (n > 64) path must agree with LAPACK."""
    rng = np.random.RandomState(5)
    n = 200
    m = rng.randn(n, n)
    a = m @ m.T + n * np.eye(n)
    l = np.asarray(linalg.cholesky(jnp.asarray(a)))
    np.testing.assert_allclose(l, np.linalg.cholesky(a), atol=1e-8)
    x = rng.randn(n)
    got = np.asarray(linalg.solve_spd(jnp.asarray(a), jnp.asarray(x)))
    np.testing.assert_allclose(got, np.linalg.solve(a, x), atol=1e-8)
