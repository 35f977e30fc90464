"""Camera solve from scratch: incremental SfM bootstrap + BA refine.

Counterpart of the reference's camera_solve pipeline
(ref: python/mmSolver/_api/solvercamerautils.py:958-1290):
  1. score frames by shared-marker connectivity (_compute_connected_
     frame_scores, solvercamerautils.py:135);
  2. robust relative pose between the best-connected frame pair
     (mmCameraRelativePose command -> our robust_relative_pose);
  3. triangulate bundles (solvercamerautils.py:690);
  4. resection the remaining frames from triangulated points;
  5. full bundle adjustment over all poses + bundles (our solver);
  6. origin-frame normalization (_set_camera_origin_frame,
     solvercamerautils.py:730).

Marker input is (M, F, 2) in the solver's [-0.5, 0.5] screen space plus
an (M, F) enable mask; intrinsics are focal length + film back.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mayamatchmovesolver_tpu.sfm import twoview


class CameraSolveResult(NamedTuple):
    # Camera pose per frame: world-from-camera rotation + position.
    rotations: np.ndarray  # (F, 3, 3)
    positions: np.ndarray  # (F, 3)
    points3d: np.ndarray  # (M, 3)
    point_valid: np.ndarray  # (M,) bool
    frame_solved: np.ndarray  # (F,) bool


def markers_to_bearings(marker_xy, focal_length_mm, film_back_width_mm,
                        render_aspect):
    """Marker space [-0.5, 0.5] -> normalized CV-convention bearings.

    From the projection matrix derivation (core/camera.py, horizontal
    film fit): x_cam/(-z_cam) = marker_x * film_back_w / focal and
    y_cam/(-z_cam) = marker_y * film_back_w / (render_aspect * focal)
    (the y projection scale carries the image aspect; the film-fit
    marker scaling keeps observations in the same space).  The SfM math
    runs in the right-handed OpenCV frame (x right, y DOWN, z forward),
    hence the sign flip on v.
    """
    u = marker_xy[..., 0] * film_back_width_mm / focal_length_mm
    v = -marker_xy[..., 1] * film_back_width_mm / (
        render_aspect * focal_length_mm
    )
    return jnp.stack([u, v], axis=-1)


def connected_frame_scores(enable_mask):
    """(ref: _compute_connected_frame_scores,
    solvercamerautils.py:135) — per-frame count of enabled markers."""
    return np.asarray(enable_mask).sum(axis=0)


def best_frame_pair(enable_mask, min_separation=5):
    """Pick the pair of frames sharing the most markers with at least
    min_separation frames between them (baseline heuristic like the
    reference's start/end-frame choice)."""
    enable = np.asarray(enable_mask) > 0.5
    num_frames = enable.shape[1]
    best = (0, min(num_frames - 1, min_separation))
    best_score = -1
    for a in range(num_frames):
        for b in range(a + min_separation, num_frames):
            score = int(np.sum(enable[:, a] & enable[:, b]))
            if score > best_score:
                best_score = score
                best = (a, b)
    return best


def camera_solve(
    marker_xy,
    enable_mask,
    focal_length_mm=35.0,
    film_back_width_mm=36.0,
    film_back_height_mm=24.0,
    render_aspect=None,
    key=None,
    min_pair_separation=5,
) -> CameraSolveResult:
    """Incremental SfM over all frames; returns per-frame poses and
    triangulated points in an arbitrary (origin-normalized) scale.

    render_aspect defaults to the film-back aspect (square-pixel
    aspect-matched delivery, the common case)."""
    marker_xy = np.asarray(marker_xy, dtype=np.float64)
    enable = np.asarray(enable_mask) > 0.5
    num_markers, num_frames = enable.shape
    if key is None:
        key = jax.random.PRNGKey(42)
    if render_aspect is None:
        render_aspect = film_back_width_mm / film_back_height_mm

    bearings = np.asarray(
        markers_to_bearings(
            jnp.asarray(marker_xy), focal_length_mm, film_back_width_mm,
            render_aspect,
        )
    )  # (M, F, 2)

    f0, f1 = best_frame_pair(enable, min_pair_separation)
    shared = enable[:, f0] & enable[:, f1]
    if shared.sum() < 8:
        raise ValueError(
            "not enough shared markers (%d) between frames %d and %d"
            % (int(shared.sum()), f0, f1)
        )

    pose = twoview.robust_relative_pose(
        jnp.asarray(bearings[shared, f0]),
        jnp.asarray(bearings[shared, f1]),
        key=key,
        num_hypotheses=128,
        inlier_threshold=1e-5,
    )
    r1 = np.asarray(pose.rotation)
    t1 = np.asarray(pose.translation)

    # Camera-from-world per frame: frame f0 = identity.
    cam_r = np.zeros((num_frames, 3, 3))
    cam_t = np.zeros((num_frames, 3))
    solved = np.zeros(num_frames, bool)
    cam_r[f0] = np.eye(3)
    cam_t[f0] = 0.0
    cam_r[f1] = r1
    cam_t[f1] = t1
    solved[f0] = solved[f1] = True

    # Triangulate every marker seen in both anchor frames (full padded
    # set; invalid rows are masked out afterwards).
    pts3d = np.zeros((num_markers, 3))
    valid = np.zeros(num_markers, bool)
    tri = np.asarray(
        twoview.triangulate_linear(
            jnp.eye(3), jnp.zeros(3), jnp.asarray(r1), jnp.asarray(t1),
            jnp.asarray(bearings[:, f0]),
            jnp.asarray(bearings[:, f1]),
        )
    )
    pts3d[shared] = tri[shared]
    valid[shared] = np.asarray(pose.inliers)

    # Incremental resection of remaining frames, most-connected first
    # (ref: _solve_relative_poses loop, solvercamerautils.py:574).
    # All calls use the full padded point set with zero weights for
    # missing observations, so one compiled program serves every frame.
    resect = jax.jit(twoview.resection_pose)
    triangulate = jax.jit(twoview.triangulate_linear)
    order = np.argsort(-connected_frame_scores(enable & valid[:, None]))
    for f in order:
        if solved[f]:
            continue
        seen = enable[:, f] & valid
        if seen.sum() < 6:
            continue
        r, t = resect(
            jnp.asarray(pts3d),
            jnp.asarray(bearings[:, f]),
            weights=jnp.asarray(seen, dtype=np.float64),
        )
        cam_r[f] = np.asarray(r)
        cam_t[f] = np.asarray(t)
        solved[f] = True

        # Triangulate new points against the anchor frame.
        new = enable[:, f] & enable[:, f0] & ~valid
        if new.sum() > 0:
            tri = np.asarray(
                triangulate(
                    jnp.eye(3), jnp.zeros(3),
                    jnp.asarray(cam_r[f]), jnp.asarray(cam_t[f]),
                    jnp.asarray(bearings[:, f0]),
                    jnp.asarray(bearings[:, f]),
                )
            )
            pts3d[new] = tri[new]
            valid[new] = True

    # Convert from the CV frame back to the Maya camera convention.
    # With S = diag(1,-1,-1) mapping CV camera axes (y down, z forward)
    # to Maya camera axes (y up, z backward):
    #   maya camera world rotation R_m = S R_cv^T S
    #   maya camera position       c_m = S (-R_cv^T t_cv)
    #   maya world points          p_m = S p_cv
    s = np.diag([1.0, -1.0, -1.0])
    centers = -np.einsum("fji,fj->fi", cam_r, cam_t)
    world_r = np.einsum(
        "ij,fkj,kl->fil", s, cam_r, s
    )  # S @ R_cv^T @ S
    world_t = centers @ s.T
    points_m = pts3d @ s.T

    return CameraSolveResult(
        rotations=world_r,
        positions=world_t,
        points3d=points_m,
        point_valid=valid,
        frame_solved=solved,
    )


def refine_with_bundle_adjustment(
    result: CameraSolveResult,
    marker_xy,
    enable_mask,
    focal_length_mm=35.0,
    film_back_width_mm=36.0,
    film_back_height_mm=24.0,
    render_aspect=None,
    image_width=1920.0,
    max_iterations=25,
    solve_focal=False,
):
    """Full BA polish of the incremental SfM result — the reference's
    final per-bundle + global bundle-adjust passes
    (ref: _bundle_adjust, solvercamerautils.py:380) via our structured
    Schur solver.

    Returns (refined CameraSolveResult, BAResult).
    """
    import jax.numpy as jnp

    from mayamatchmovesolver_tpu.core.transform import matrix_to_euler
    from mayamatchmovesolver_tpu.solver import ba

    if render_aspect is None:
        render_aspect = film_back_width_mm / film_back_height_mm

    num_markers, num_frames = np.asarray(enable_mask).shape
    # Camera params: tx ty tz rx ry rz from the recovered poses.
    eulers = np.asarray(
        matrix_to_euler(
            jnp.asarray(result.rotations), jnp.zeros((), jnp.int32)
        )
    )
    cam_params = np.concatenate([result.positions, eulers], axis=-1)
    if solve_focal:
        cam_params = np.concatenate(
            [cam_params, np.full((num_frames, 1), focal_length_mm)],
            axis=-1,
        )

    weight = np.asarray(enable_mask, float) * result.point_valid[:, None]
    problem = ba.make_ba_problem(
        marker_uv=np.asarray(marker_xy),
        weight=weight,
        mkr_bnd_index=np.arange(num_markers),
        cam_params=cam_params,
        bnd_params=result.points3d,
        focal_length_mm=focal_length_mm,
        film_back_width_mm=film_back_width_mm,
        film_back_height_mm=film_back_height_mm,
        render_width=int(image_width),
        render_height=int(round(image_width / render_aspect)),
        image_width=image_width,
        solve_focal=solve_focal,
    )
    ba_result = ba.solve_ba(problem, max_iterations=max_iterations)

    cam_out = np.asarray(ba_result.cam_params)
    from mayamatchmovesolver_tpu.core.transform import (
        euler_to_rotation_matrix,
    )

    rotations = np.asarray(
        euler_to_rotation_matrix(
            jnp.asarray(cam_out[:, 3]),
            jnp.asarray(cam_out[:, 4]),
            jnp.asarray(cam_out[:, 5]),
            jnp.zeros(num_frames, jnp.int32),
        )
    )
    refined = CameraSolveResult(
        rotations=rotations,
        positions=cam_out[:, :3],
        points3d=np.asarray(ba_result.bnd_params),
        point_valid=result.point_valid,
        frame_solved=result.frame_solved,
    )
    return refined, ba_result


def set_origin_frame(result: CameraSolveResult, origin_frame=0,
                     scene_scale=1.0) -> CameraSolveResult:
    """Normalize so the origin frame's camera sits at the world origin
    with identity orientation, and scale the scene
    (ref: _set_camera_origin_frame, solvercamerautils.py:730)."""
    r0 = result.rotations[origin_frame]
    p0 = result.positions[origin_frame]
    r0_inv = r0.T
    rotations = np.einsum("ij,fjk->fik", r0_inv, result.rotations)
    positions = (
        np.einsum("ij,fj->fi", r0_inv, result.positions - p0) * scene_scale
    )
    points3d = (
        np.einsum("ij,mj->mi", r0_inv, result.points3d - p0) * scene_scale
    )
    return CameraSolveResult(
        rotations=rotations,
        positions=positions,
        points3d=points3d,
        point_valid=result.point_valid,
        frame_solved=result.frame_solved,
    )
