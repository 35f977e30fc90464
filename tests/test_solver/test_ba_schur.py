"""Structured Schur-complement BA vs the dense LM path.

BASELINE config #3 at test scale: joint camera+bundle solve.  The
oracle is (a) ground-truth recovery and (b) agreement with the dense
solver on the same problem — the analogue of the reference's
MayaDAG vs MMSceneGraph backend matrix
(ref: tests/test/test_solver/test1.py:124-158)."""

import jax
import jax.numpy as jnp
import numpy as np

from mayamatchmovesolver_tpu.solver import ba


def _synthetic_ba(num_frames=10, num_bundles=12, seed=3,
                  perturb=0.05):
    rng = np.random.RandomState(seed)
    cam_true = np.zeros((num_frames, 6))
    cam_true[:, 0] = np.linspace(-2, 2, num_frames)  # tx
    cam_true[:, 1] = 1.0 + 0.1 * np.sin(np.linspace(0, 3, num_frames))
    cam_true[:, 2] = 10.0
    cam_true[:, 4] = np.linspace(-6, 6, num_frames)  # ry

    bnd_true = np.stack(
        [
            rng.uniform(-4, 4, num_bundles),
            rng.uniform(-2, 2, num_bundles),
            rng.uniform(-8, -3, num_bundles),
        ],
        axis=-1,
    )
    mkr_bnd = np.arange(num_bundles)

    problem0 = ba.make_ba_problem(
        marker_uv=np.zeros((num_bundles, num_frames, 2)),
        weight=np.ones((num_bundles, num_frames)),
        mkr_bnd_index=mkr_bnd,
        cam_params=cam_true,
        bnd_params=bnd_true,
        render_width=1920,
        render_height=1080,
    )
    # Ground-truth observations from the model itself.
    r, _, _ = ba._residual_and_blocks(
        problem0, jnp.asarray(cam_true), jnp.asarray(bnd_true)
    )
    # r = (uv - proj) * image_width with uv=0 -> proj = -r / image_width
    uv_true = -np.asarray(r) / problem0.image_width

    cam0 = cam_true + rng.normal(0, perturb, cam_true.shape)
    bnd0 = bnd_true + rng.normal(0, perturb, bnd_true.shape)
    problem = problem0._replace(
        marker_uv=jnp.asarray(uv_true),
        cam_params=jnp.asarray(cam0),
        bnd_params=jnp.asarray(bnd0),
    )
    return problem, cam_true, bnd_true


def test_schur_ba_reduces_cost_to_zero():
    problem, cam_true, bnd_true = _synthetic_ba()
    result = jax.jit(
        lambda p: ba.solve_ba(p, max_iterations=30)
    )(problem)
    assert float(result.cost) < 1e-10 * float(result.cost_initial), (
        float(result.cost),
        float(result.cost_initial),
    )
    # Gauge freedom: joint BA can slide the whole solution; check the
    # *reprojection* is matched instead of raw parameters.
    r, _, _ = ba._residual_and_blocks(
        problem, result.cam_params, result.bnd_params
    )
    assert float(jnp.max(jnp.abs(r))) < 1e-3  # pixels


def test_schur_step_matches_dense_normal_equations():
    """One damped step must equal the dense solve of the same JtJ."""
    problem, _, _ = _synthetic_ba(num_frames=4, num_bundles=5)
    mu = 1e-3

    dx_cam, dx_bnd, cost, gnorm, *_ = ba._schur_normal_step(
        problem, problem.cam_params, problem.bnd_params, mu
    )

    # Dense oracle: flatten params, jacfwd the whole residual.
    def residual_flat(x):
        f, pc = problem.cam_params.shape
        b = problem.bnd_params.shape[0]
        cam = x[: f * pc].reshape(f, pc)
        bnd = x[f * pc:].reshape(b, 3)
        r, _, _ = ba._residual_and_blocks(problem, cam, bnd)
        return r.reshape(-1)

    x0 = jnp.concatenate(
        [problem.cam_params.reshape(-1), problem.bnd_params.reshape(-1)]
    )
    j = jax.jacfwd(residual_flat)(x0)
    r = residual_flat(x0)
    jtj = j.T @ j
    g = j.T @ r
    d = jnp.maximum(jnp.diag(jtj), 1e-12)
    dx_dense = np.linalg.solve(
        np.asarray(jtj + mu * jnp.diag(d)), -np.asarray(g)
    )

    f, pc = problem.cam_params.shape
    np.testing.assert_allclose(
        np.asarray(dx_cam).reshape(-1), dx_dense[: f * pc], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(dx_bnd).reshape(-1), dx_dense[f * pc:], atol=1e-6
    )


def test_ba_with_focal_solve():
    problem, cam_true, bnd_true = _synthetic_ba(num_frames=8,
                                                num_bundles=10,
                                                perturb=0.0)
    # Add focal as a 7th parameter; start off-truth.
    cam7 = np.concatenate(
        [np.asarray(problem.cam_params),
         np.full((8, 1), 38.0)], axis=-1,
    )
    problem7 = problem._replace(
        cam_params=jnp.asarray(cam7), solve_focal=True
    )
    # Observations were made with focal 35 (intrinsics default).
    result = jax.jit(
        lambda p: ba.solve_ba(p, max_iterations=40)
    )(problem7)
    solved_focal = np.asarray(result.cam_params)[:, 6]
    np.testing.assert_allclose(solved_focal, 35.0, atol=0.2)
