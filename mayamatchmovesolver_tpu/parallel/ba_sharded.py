"""Distributed bundle adjustment: frame-sharded Schur + collective CG.

The scalable multi-host path (BASELINE config #5: keyframe-block
sharded 1000-frame shots).  Everything the reference lacks
(SURVEY.md section 2.3 — it is single-process): the frame axis is
sharded over the device mesh; each device owns its frame block's
camera parameters, observations and Jacobian blocks; bundles (the
3D points) are the *shared* state reduced over ICI.

Per LM iteration:
  1. each device builds its local per-observation Jacobian blocks
     (solver/ba.py machinery) — zero communication;
  2. bundle blocks A_b = sum_f Jb^T Jb and gradients are psum-reduced
     ((B, 3, 3) + (B, 3) — tiny);
  3. the reduced camera system S dx = rhs is solved by conjugate
     gradients where each matvec costs ONE psum of a (B, 3) bundle
     aggregate: S x = B_f x_f - sum_m W_mf^T A_m^-1 (sum_{f'} W_mf' x_f'),
     with block-Jacobi (per-frame) preconditioning;
  4. bundle back-substitution is local + one psum.

So the per-iteration communication volume is O(B) floats times
(CG iterations + 2) — independent of frame count: scaling efficiency
stays high as frames/devices grow, which is the whole point of
Schur-complement distribution.
"""

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mayamatchmovesolver_tpu.core import transform as tfm_math
from mayamatchmovesolver_tpu.solver import ba as ba_mod
from mayamatchmovesolver_tpu.solver import linalg

try:
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


class ShardedBAResult(NamedTuple):
    cam_params: jax.Array  # (F, P_c) global
    bnd_params: jax.Array  # (B, 3)
    cost: jax.Array
    cost_initial: jax.Array
    iterations: jax.Array


def shard_ba_problem(problem: ba_mod.BAProblem, mesh: Mesh,
                     axis_name="frames") -> ba_mod.BAProblem:
    """Device_put the frame-axis leaves onto the mesh."""
    f_shard = NamedSharding(mesh, P(None, axis_name))
    cam_shard = NamedSharding(mesh, P(axis_name, None))
    rep = NamedSharding(mesh, P())
    return dataclasses.replace(
        problem,
        marker_uv=jax.device_put(problem.marker_uv, f_shard),
        weight=jax.device_put(problem.weight, f_shard),
        mkr_bnd_index=jax.device_put(problem.mkr_bnd_index, rep),
        cam_params=jax.device_put(problem.cam_params, cam_shard),
        bnd_params=jax.device_put(problem.bnd_params, rep),
        intrinsics=jax.device_put(problem.intrinsics, cam_shard),
    )


def sharded_solve_ba(
    problem: ba_mod.BAProblem,
    mesh: Mesh,
    max_iterations=20,
    tau=1e-3,
    cg_iterations=30,
    axis_name="frames",
) -> ShardedBAResult:
    """Frame-sharded LM/Schur/CG bundle adjustment.

    problem arrays may be host-global; they are sharded on entry.
    Returns globally-assembled results.
    """
    num_frames = problem.cam_params.shape[0]
    n_dev = mesh.devices.size
    if num_frames % n_dev != 0:
        raise ValueError(
            "frame count %d not divisible by %d devices"
            % (num_frames, n_dev)
        )
    num_bundles = problem.bnd_params.shape[0]

    def lm_loop(marker_uv, weight, mkr_bnd_index, cam_params,
                bnd_params, intrinsics):
        """Runs per-shard; explicit collectives."""
        local = dataclasses.replace(
            problem,
            marker_uv=marker_uv,
            weight=weight,
            mkr_bnd_index=mkr_bnd_index,
            cam_params=cam_params,
            bnd_params=bnd_params,
            intrinsics=intrinsics,
        )

        def cost_of(cam, bnd):
            c = ba_mod._ba_cost_only(
                dataclasses.replace(local, cam_params=cam,
                                    bnd_params=bnd),
                cam, bnd,
            )
            return jax.lax.psum(c, axis_name)

        def gn_step(cam, bnd, mu):
            r, j_cam, j_bnd = ba_mod._residual_and_blocks(
                dataclasses.replace(local, cam_params=cam,
                                    bnd_params=bnd),
                cam, bnd,
            )
            cost = jax.lax.psum(0.5 * jnp.sum(r * r), axis_name)

            b_blocks = jnp.einsum("mfra,mfrb->fab", j_cam, j_cam)
            g_cam = jnp.einsum("mfra,mfr->fa", j_cam, r)
            a_m = jnp.einsum("mfra,mfrb->mab", j_bnd, j_bnd)
            a_blocks = jax.lax.psum(
                jax.ops.segment_sum(
                    a_m, mkr_bnd_index, num_segments=num_bundles
                ),
                axis_name,
            )
            g_bnd = jax.lax.psum(
                jax.ops.segment_sum(
                    jnp.einsum("mfra,mfr->ma", j_bnd, r),
                    mkr_bnd_index,
                    num_segments=num_bundles,
                ),
                axis_name,
            )
            w_mf = jnp.einsum("mfra,mfrb->mfab", j_bnd, j_cam)

            eye3 = jnp.eye(3, dtype=cam.dtype)
            d_a = jnp.maximum(
                jnp.diagonal(a_blocks, axis1=-2, axis2=-1), 1e-12
            )
            a_damped = a_blocks + mu * d_a[..., None] * eye3
            a_inv = tfm_math.inverse3(a_damped)
            a_inv_m = a_inv[mkr_bnd_index]

            p_c = cam.shape[-1]
            eye_c = jnp.eye(p_c, dtype=cam.dtype)
            d_b = jnp.maximum(
                jnp.diagonal(b_blocks, axis1=-2, axis2=-1), 1e-12
            )
            b_damped = b_blocks + mu * d_b[..., None] * eye_c

            g_bnd_pre = jnp.einsum("mab,mb->ma", a_inv_m,
                                   g_bnd[mkr_bnd_index])
            rhs = -(g_cam - jnp.einsum("mfab,ma->fb", w_mf, g_bnd_pre))

            def matvec(x):
                # x: (F_local, P_c).  One psum per call.
                y_m = jnp.einsum("mfab,fb->ma", w_mf, x)
                y_b = jax.lax.psum(
                    jax.ops.segment_sum(
                        y_m, mkr_bnd_index, num_segments=num_bundles
                    ),
                    axis_name,
                )
                y_pre = jnp.einsum(
                    "mab,mb->ma", a_inv_m, y_b[mkr_bnd_index]
                )
                return jnp.einsum(
                    "fab,fb->fa", b_damped, x
                ) - jnp.einsum("mfab,ma->fb", w_mf, y_pre)

            # Preconditioner: the *exact* per-frame Schur diagonal
            # block S_ff = B_f - sum_m W_mf^T A_m^-1 W_mf (all local —
            # no communication).  Plain B_f block-Jacobi is far too
            # weak for this pixel^2-scaled system and lets CG diverge.
            s_diag = b_damped - jnp.einsum(
                "mfab,mac,mfcd->fbd", w_mf, a_inv_m, w_mf
            )
            s_diag = s_diag + 1e-8 * jnp.maximum(
                jnp.diagonal(s_diag, axis1=-2, axis2=-1), 1e-12
            )[..., None] * eye_c

            def precond(v):
                return linalg.cholesky_solve(s_diag, v)

            def pdot(a, b):
                return jax.lax.psum(jnp.sum(a * b), axis_name)

            # Preconditioned CG with breakdown guards: a non-positive
            # curvature (rounding-induced indefiniteness) freezes the
            # iterate instead of exploding.
            x0 = jnp.zeros_like(rhs)
            r0 = rhs
            z0 = precond(r0)
            p0 = z0

            def cg_body(_, state):
                x, r_vec, z, p = state
                ap = matvec(p)
                rz = pdot(r_vec, z)
                pap = pdot(p, ap)
                ok = (pap > 0.0) & (rz > 0.0)
                alpha = jnp.where(ok, rz / jnp.where(ok, pap, 1.0), 0.0)
                x = x + alpha * p
                r_new = jnp.where(ok, r_vec - alpha * ap, r_vec)
                z_new = precond(r_new)
                beta = jnp.where(
                    ok,
                    pdot(r_new, z_new) / jnp.where(ok, rz, 1.0),
                    0.0,
                )
                p_new = jnp.where(ok, z_new + beta * p, p)
                return (x, r_new, z_new, p_new)

            dx_cam, _, _, _ = jax.lax.fori_loop(
                0, cg_iterations, cg_body, (x0, r0, z0, p0)
            )

            # Bundle back-substitution (one psum).
            w_dx = jax.lax.psum(
                jax.ops.segment_sum(
                    jnp.einsum("mfab,fb->ma", w_mf, dx_cam),
                    mkr_bnd_index,
                    num_segments=num_bundles,
                ),
                axis_name,
            )
            dx_bnd = -jnp.einsum("bij,bj->bi", a_inv, g_bnd + w_dx)
            return cost, dx_cam, dx_bnd

        cost0 = cost_of(cam_params, bnd_params)
        mu0 = jnp.asarray(tau, cam_params.dtype)

        def cond(s):
            cam, bnd, cost, mu, nu, it = s
            return it < max_iterations

        def body(s):
            cam, bnd, cost, mu, nu, it = s
            _, dx_cam, dx_bnd = gn_step(cam, bnd, mu)
            # Acceptance must be decided from *replicated* quantities
            # only (shard_map tracks varying axes): dx_bnd and the
            # psum-reduced cost are replicated; a NaN in any shard's
            # dx_cam poisons cost_new, so it is caught there.
            cam_new = cam + dx_cam
            bnd_new = bnd + dx_bnd
            cost_new = cost_of(cam_new, bnd_new)
            accept = (
                (cost_new < cost)
                & jnp.isfinite(cost_new)
                & jnp.all(jnp.isfinite(dx_bnd))
            )
            cam = jnp.where(accept, cam_new, cam)
            bnd = jnp.where(accept, bnd_new, bnd)
            cost = jnp.where(accept, cost_new, cost)
            mu = jnp.where(accept, mu * (1.0 / 3.0), mu * nu)
            nu = jnp.where(accept, 2.0, nu * 2.0)
            return (cam, bnd, cost, mu, nu, it + 1)

        cam, bnd, cost, mu, nu, it = jax.lax.while_loop(
            cond,
            body,
            (cam_params, bnd_params, cost0,
             mu0, jnp.asarray(2.0, cam_params.dtype),
             jnp.asarray(0, jnp.int32)),
        )
        return cam, bnd, cost, cost0, it

    fn = shard_map(
        lm_loop,
        mesh=mesh,
        in_specs=(
            P(None, axis_name),  # marker_uv
            P(None, axis_name),  # weight
            P(),                 # mkr_bnd_index
            P(axis_name, None),  # cam_params
            P(),                 # bnd_params
            P(axis_name, None),  # intrinsics
        ),
        out_specs=(
            P(axis_name, None),  # cam
            P(),                 # bnd
            P(),                 # cost
            P(),                 # cost0
            P(),                 # iterations
        ),
    )
    cam, bnd, cost, cost0, it = fn(
        problem.marker_uv,
        problem.weight,
        problem.mkr_bnd_index,
        problem.cam_params,
        problem.bnd_params,
        problem.intrinsics,
    )
    return ShardedBAResult(
        cam_params=cam,
        bnd_params=bnd,
        cost=cost,
        cost_initial=cost0,
        iterations=it,
    )
