"""Batch 3D -> 2D reprojection utility.

Capability of the reference's mmReprojection command + node
(ref: src/mmSolver/cmd/MMReprojectionCmd.cpp, node/MMReprojectionNode.cpp:119,
core/reprojection.cpp) and the Python rig helper
(ref: python/mmSolver/utils/reproject.py:90): given camera transforms
and intrinsics, map world points into marker space [-0.5, 0.5],
normalized [0, 1] coords, or pixels.
"""

import jax.numpy as jnp

from mayamatchmovesolver_tpu.core import camera as cam_math
from mayamatchmovesolver_tpu.core import transform as tfm_math
from mayamatchmovesolver_tpu.core.constants import MM_TO_INCH, FilmFit


def reproject_points(
    points_world,
    camera_world_matrix,
    focal_length_mm=35.0,
    film_back_width_mm=36.0,
    film_back_height_mm=24.0,
    film_offset_x_mm=0.0,
    film_offset_y_mm=0.0,
    render_width=1920,
    render_height=1080,
    film_fit=FilmFit.HORIZONTAL,
    near_clip_cm=0.1,
    far_clip_cm=10000.0,
    camera_scale=1.0,
    as_pixels=False,
    as_normalized=False,
):
    """points_world (..., 3), camera_world_matrix (..., 4, 4) broadcast.

    Default output is marker space [-0.5, 0.5]; as_normalized gives
    [0, 1]; as_pixels gives pixel coordinates (y up).
    """
    proj = cam_math.projection_matrix(
        focal_length_mm,
        film_back_width_mm * MM_TO_INCH,
        film_back_height_mm * MM_TO_INCH,
        film_offset_x_mm * MM_TO_INCH,
        film_offset_y_mm * MM_TO_INCH,
        float(render_width),
        float(render_height),
        film_fit,
        near_clip_cm,
        far_clip_cm,
        camera_scale,
    )
    cam_inv = tfm_math.affine_inverse(jnp.asarray(camera_world_matrix))
    p = jnp.concatenate(
        [
            jnp.asarray(points_world),
            jnp.ones_like(jnp.asarray(points_world)[..., :1]),
        ],
        axis=-1,
    )
    clip = jnp.einsum(
        "...ij,...j->...i", proj, jnp.einsum("...ij,...j->...i", cam_inv, p)
    )
    marker_xy = clip[..., :2] / clip[..., 3:4] * 0.5
    if as_pixels:
        return (marker_xy + 0.5) * jnp.asarray(
            [float(render_width), float(render_height)]
        )
    if as_normalized:
        return marker_xy + 0.5
    return marker_xy


def camera_world_matrix_from_trs(tx, ty, tz, rx, ry, rz, rotate_order=0):
    """Convenience: camera world matrix from TRS values (degrees)."""
    return tfm_math.trs_matrix(
        tx, ty, tz, rx, ry, rz, 1.0, 1.0, 1.0, rotate_order
    )
