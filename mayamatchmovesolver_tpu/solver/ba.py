"""Structured bundle adjustment: Schur complement over camera/bundle
blocks, MXU-friendly, never forming the dense Jacobian.

This is the TPU-native replacement for the reference's dense
cminpack QR over a finite-difference Jacobian
(ref: adjust_cminpack_lmdif.cpp:61-202, adjust_solveFunc.cpp:305-525;
the sparsity the reference only exploits by *culling* evaluations via
errorToParamList bitmaps, adjust_solveFunc.cpp:187-226, is here the
explicit block structure of the normal equations).

Problem shape (the classic BA arrowhead):
  * camera parameters: (F, P_c) — per-frame 6-DoF pose (+ optional
    focal length), independent across frames;
  * bundle parameters: (B, 3) — world positions, independent across
    bundles;
  * residual r_{m,f} depends only on (camera frame f, bundle b(m)).

Per-observation Jacobians come from vmap(jacfwd) of a *tiny* function
(2 outputs, P_c+3 inputs), so the Jacobian work is one fused batched
kernel over (M, F).  The normal equations are assembled with einsums
(MXU work), bundles are eliminated in closed form (batched 3x3
inverses), and the reduced camera system

    S = blkdiag(B_f) - sum_m W_{m,f}^T A_m^{-1} W_{m,f'}

is solved with our any-dtype Cholesky.  An LM damping loop wraps it.
"""

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from mayamatchmovesolver_tpu.core import camera as cam_math
from mayamatchmovesolver_tpu.core import transform as tfm_math
from mayamatchmovesolver_tpu.core.constants import MM_TO_INCH
from mayamatchmovesolver_tpu.scene.flatscene import NEAR_CLIP_PLANE_CM
from mayamatchmovesolver_tpu.solver import linalg

CAM_PARAMS_POSE = 6  # tx ty tz rx ry rz
CAM_PARAMS_POSE_FOCAL = 7  # + focal length


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BAProblem:
    """Arrays fully describing the structured BA problem (a pytree;
    configuration fields are static so they select compiled variants)."""

    marker_uv: jax.Array  # (M, F, 2) observed, film-fit-scaled space
    weight: jax.Array  # (M, F) sqrt-applied marker weights * mask
    mkr_bnd_index: jax.Array  # (M,) bundle index per marker
    cam_params: jax.Array  # (F, P_c) initial camera params
    bnd_params: jax.Array  # (B, 3) initial bundle positions
    intrinsics: jax.Array  # (F, 8) [focal, fbw_mm, fbh_mm, offx_mm,
    #                       offy_mm, far_cm, cam_scale, render_aspect]
    film_fit: int = dataclasses.field(metadata={"static": True})
    rotate_order: int = dataclasses.field(metadata={"static": True})
    image_width: float = dataclasses.field(metadata={"static": True})
    solve_focal: bool = dataclasses.field(metadata={"static": True})

    def _replace(self, **kwargs):
        return dataclasses.replace(self, **kwargs)


class BAResult(NamedTuple):
    cam_params: jax.Array
    bnd_params: jax.Array
    cost: jax.Array
    cost_initial: jax.Array
    iterations: jax.Array
    stop_reason: jax.Array


def _observation_residual(cam_vec, bnd_vec, intr, problem_static, uv):
    """Residual of ONE (marker, frame) observation; the unit the
    Jacobians differentiate.  cam_vec: (P_c,), bnd_vec: (3,)."""
    film_fit, rotate_order, image_width, solve_focal = problem_static
    tx, ty, tz, rx, ry, rz = cam_vec[:6]
    if solve_focal:
        focal = cam_vec[6]
    else:
        focal = intr[0]
    fbw_mm, fbh_mm = intr[1], intr[2]
    offx_mm, offy_mm = intr[3], intr[4]
    far_cm, cam_scale, render_aspect = intr[5], intr[6], intr[7]

    cam_world = tfm_math.trs_matrix(
        tx, ty, tz, rx, ry, rz, 1.0, 1.0, 1.0, rotate_order
    )
    cam_inv = tfm_math.affine_inverse(cam_world)
    proj = cam_math.projection_matrix(
        focal,
        fbw_mm * MM_TO_INCH,
        fbh_mm * MM_TO_INCH,
        offx_mm * MM_TO_INCH,
        offy_mm * MM_TO_INCH,
        render_aspect,
        1.0,
        film_fit,
        NEAR_CLIP_PLANE_CM,
        far_cm,
        cam_scale,
    )
    p = jnp.concatenate([bnd_vec, jnp.ones(1, bnd_vec.dtype)])
    clip = proj @ (cam_inv @ p)
    point_xy = clip[:2] / clip[3] * 0.5
    return (uv - point_xy) * image_width


def _residual_and_blocks(problem: BAProblem, cam_params, bnd_params):
    """All residuals + per-observation Jacobian blocks, batched."""
    static = (
        problem.film_fit,
        problem.rotate_order,
        problem.image_width,
        problem.solve_focal,
    )
    bnd_per_marker = bnd_params[problem.mkr_bnd_index]  # (M, 3)

    def per_obs(cam_vec, bnd_vec, intr, uv):
        return _observation_residual(cam_vec, bnd_vec, intr, static, uv)

    # vmap over frames (cam axis) then markers.
    def per_marker(bnd_vec, uv_row):
        # uv_row: (F, 2); map over frames.
        f = lambda cam_vec, intr, uv: per_obs(  # noqa: E731
            cam_vec, bnd_vec, intr, uv
        )
        r = jax.vmap(f)(cam_params, problem.intrinsics, uv_row)
        jc = jax.vmap(jax.jacfwd(f, argnums=0))(
            cam_params, problem.intrinsics, uv_row
        )
        jb = jax.vmap(
            lambda cam_vec, intr, uv: jax.jacfwd(
                lambda b: per_obs(cam_vec, b, intr, uv)
            )(bnd_vec)
        )(cam_params, problem.intrinsics, uv_row)
        return r, jc, jb

    r, j_cam, j_bnd = jax.vmap(per_marker)(
        bnd_per_marker, problem.marker_uv
    )
    # r: (M, F, 2); j_cam: (M, F, 2, P_c); j_bnd: (M, F, 2, 3).
    w = problem.weight[..., None]
    r = r * w
    j_cam = j_cam * w[..., None]
    j_bnd = j_bnd * w[..., None]
    return r, j_cam, j_bnd


def _schur_normal_step(problem, cam_params, bnd_params, mu):
    """One damped Gauss-Newton step via Schur elimination of bundles.

    Returns (dx_cam (F,P_c), dx_bnd (B,3), cost, grad_inf_norm).
    """
    r, j_cam, j_bnd = _residual_and_blocks(problem, cam_params, bnd_params)
    num_bundles = bnd_params.shape[0]
    num_frames, p_c = cam_params.shape

    cost = 0.5 * jnp.sum(r * r)

    # Per-frame camera blocks: B_f = sum_m Jc^T Jc   (P_c x P_c).
    b_blocks = jnp.einsum("mfra,mfrb->fab", j_cam, j_cam)
    g_cam = jnp.einsum("mfra,mfr->fa", j_cam, r)

    # Per-bundle blocks: A_b = sum over obs of marker(s) of bundle b.
    a_m = jnp.einsum("mfra,mfrb->mab", j_bnd, j_bnd)  # (M, 3, 3)
    a_blocks = jax.ops.segment_sum(
        a_m, problem.mkr_bnd_index, num_segments=num_bundles
    )
    g_bnd_m = jnp.einsum("mfra,mfr->ma", j_bnd, r)
    g_bnd = jax.ops.segment_sum(
        g_bnd_m, problem.mkr_bnd_index, num_segments=num_bundles
    )

    # Marquardt damping on both diagonals.
    def damp(block, mu):
        d = jnp.maximum(
            jnp.diagonal(block, axis1=-2, axis2=-1), 1e-12
        )
        return block + mu * d[..., None] * jnp.eye(
            block.shape[-1], dtype=block.dtype
        )

    a_damped = damp(a_blocks, mu)
    b_damped = damp(b_blocks, mu)

    # W_{m,f} = Jb^T Jc per observation (3 x P_c), grouped by marker.
    w_mf = jnp.einsum("mfra,mfrb->mfab", j_bnd, j_cam)

    # A^{-1} per bundle via closed-form 3x3 inverse.
    a_inv = tfm_math.inverse3(a_damped)  # (B, 3, 3)
    a_inv_m = a_inv[problem.mkr_bnd_index]  # (M, 3, 3)

    # Reduced camera system S (F*P_c square), built as
    # S = blkdiag(B_f) - sum_m (A^-1/2 W)^T (A^-1/2 W):
    # use Y_{m,f} = A_m^{-1} W_{m,f}; S_{f,f'} -= W_{m,f}^T Y_{m,f'}.
    y_mf = jnp.einsum("mab,mfbc->mfac", a_inv_m, w_mf)
    s_cross = jnp.einsum("mfab,mgac->fbgc", w_mf, y_mf)
    s = -s_cross
    idx = jnp.arange(num_frames)
    s = s.at[idx, :, idx, :].add(b_damped)
    s_dense = s.reshape(num_frames * p_c, num_frames * p_c)

    # RHS: g_cam_reduced = g_cam - sum_m W^T A^-1 g_bnd.
    g_bnd_inv = jnp.einsum(
        "mab,mb->ma", a_inv_m, g_bnd[problem.mkr_bnd_index]
    )
    rhs = g_cam - jnp.einsum("mfab,ma->fb", w_mf, g_bnd_inv)

    dx_cam = -linalg.solve_spd(s_dense, rhs.reshape(-1)).reshape(
        num_frames, p_c
    )

    # Back-substitute bundles: dx_b = -A^-1 (g_b + sum_f W dx_cam_f).
    w_dx = jnp.einsum("mfab,fb->ma", w_mf, dx_cam)
    w_dx_b = jax.ops.segment_sum(
        w_dx, problem.mkr_bnd_index, num_segments=num_bundles
    )
    dx_bnd = -jnp.einsum("bij,bj->bi", a_inv, g_bnd + w_dx_b)

    gnorm = jnp.maximum(
        jnp.max(jnp.abs(g_cam)), jnp.max(jnp.abs(g_bnd))
    )
    diag_a = jnp.diagonal(a_blocks, axis1=-2, axis2=-1)
    diag_b = jnp.diagonal(b_blocks, axis1=-2, axis2=-1)
    return dx_cam, dx_bnd, cost, gnorm, diag_a, diag_b, g_cam, g_bnd


def _ba_cost(problem, cam_params, bnd_params):
    r, _, _ = _residual_and_blocks(problem, cam_params, bnd_params)
    return 0.5 * jnp.sum(r * r)


def _ba_cost_only(problem, cam_params, bnd_params):
    """Cost without Jacobians (cheaper accept/reject check)."""
    static = (
        problem.film_fit,
        problem.rotate_order,
        problem.image_width,
        problem.solve_focal,
    )
    bnd_per_marker = bnd_params[problem.mkr_bnd_index]

    def per_obs(cam_vec, bnd_vec, intr, uv):
        return _observation_residual(cam_vec, bnd_vec, intr, static, uv)

    r = jax.vmap(
        lambda bnd_vec, uv_row: jax.vmap(
            lambda cam_vec, intr, uv: per_obs(cam_vec, bnd_vec, intr, uv)
        )(cam_params, problem.intrinsics, uv_row)
    )(bnd_per_marker, problem.marker_uv)
    r = r * problem.weight[..., None]
    return 0.5 * jnp.sum(r * r)


class _BAState(NamedTuple):
    cam: jax.Array
    bnd: jax.Array
    cost: jax.Array
    mu: jax.Array
    nu: jax.Array
    it: jax.Array
    stop: jax.Array


def solve_ba(
    problem: BAProblem,
    max_iterations=20,
    tau=1e-3,
    eps1=1e-8,
    eps2=1e-8,
    eps3=1e-8,
) -> BAResult:
    """LM over the Schur-structured normal equations.  Jittable."""
    cost0 = _ba_cost_only(problem, problem.cam_params, problem.bnd_params)

    init = _BAState(
        cam=problem.cam_params,
        bnd=problem.bnd_params,
        cost=cost0,
        mu=jnp.asarray(tau, problem.cam_params.dtype),
        nu=jnp.asarray(2.0, problem.cam_params.dtype),
        it=jnp.asarray(0, jnp.int32),
        stop=jnp.asarray(0, jnp.int32),
    )

    def cond(s):
        return (s.stop == 0) & (s.it < max_iterations)

    def body(s):
        (dx_cam, dx_bnd, cost, gnorm, _, _, _, _) = _schur_normal_step(
            problem, s.cam, s.bnd, s.mu
        )
        ok = jnp.all(jnp.isfinite(dx_cam)) & jnp.all(
            jnp.isfinite(dx_bnd)
        )
        dx_cam = jnp.where(ok, dx_cam, 0.0)
        dx_bnd = jnp.where(ok, dx_bnd, 0.0)

        cam_new = s.cam + dx_cam
        bnd_new = s.bnd + dx_bnd
        cost_new = _ba_cost_only(problem, cam_new, bnd_new)

        accept = ok & (cost_new < cost) & jnp.isfinite(cost_new)
        rho_proxy = jnp.where(
            accept, (cost - cost_new) / jnp.maximum(cost, 1e-300), 0.0
        )

        cam2 = jnp.where(accept, cam_new, s.cam)
        bnd2 = jnp.where(accept, bnd_new, s.bnd)
        cost2 = jnp.where(accept, cost_new, cost)
        mu_new = jnp.where(accept, s.mu * (1.0 / 3.0), s.mu * s.nu)
        nu_new = jnp.where(accept, 2.0, s.nu * 2.0)

        step_norm = jnp.sqrt(
            jnp.sum(dx_cam * dx_cam) + jnp.sum(dx_bnd * dx_bnd)
        )
        x_norm = jnp.sqrt(
            jnp.sum(s.cam * s.cam) + jnp.sum(s.bnd * s.bnd)
        )
        stop = jnp.where(
            gnorm <= eps1,
            3,
            jnp.where(
                accept & (step_norm <= eps2 * (x_norm + eps2)),
                2,
                jnp.where(accept & (rho_proxy <= eps3), 1, 0),
            ),
        ).astype(jnp.int32)
        return _BAState(
            cam=cam2, bnd=bnd2, cost=cost2, mu=mu_new, nu=nu_new,
            it=s.it + 1, stop=stop,
        )

    final = jax.lax.while_loop(cond, body, init)
    stop = jnp.where(final.stop == 0, 4, final.stop)
    return BAResult(
        cam_params=final.cam,
        bnd_params=final.bnd,
        cost=final.cost,
        cost_initial=cost0,
        iterations=final.it,
        stop_reason=stop,
    )


def make_ba_problem(
    marker_uv,
    weight,
    mkr_bnd_index,
    cam_params,
    bnd_params,
    focal_length_mm=35.0,
    film_back_width_mm=36.0,
    film_back_height_mm=24.0,
    film_offset_x_mm=0.0,
    film_offset_y_mm=0.0,
    far_clip_cm=10000.0,
    camera_scale=1.0,
    render_width=1920,
    render_height=1080,
    film_fit=1,
    rotate_order=0,
    image_width: Optional[float] = None,
    solve_focal=False,
) -> BAProblem:
    """Assemble a BAProblem with shared static intrinsics."""
    marker_uv = jnp.asarray(marker_uv)
    num_frames = marker_uv.shape[1]
    dtype = marker_uv.dtype
    intr_row = jnp.asarray(
        [
            focal_length_mm,
            film_back_width_mm,
            film_back_height_mm,
            film_offset_x_mm,
            film_offset_y_mm,
            far_clip_cm,
            camera_scale,
            float(render_width) / float(render_height),
        ],
        dtype,
    )
    intrinsics = jnp.broadcast_to(intr_row, (num_frames, 8))
    return BAProblem(
        marker_uv=marker_uv,
        weight=jnp.sqrt(jnp.maximum(jnp.asarray(weight, dtype), 0.0)),
        mkr_bnd_index=jnp.asarray(mkr_bnd_index, jnp.int32),
        cam_params=jnp.asarray(cam_params, dtype),
        bnd_params=jnp.asarray(bnd_params, dtype),
        intrinsics=intrinsics,
        film_fit=int(film_fit),
        rotate_order=int(rotate_order),
        image_width=float(image_width or render_width),
        solve_focal=bool(solve_focal),
    )
