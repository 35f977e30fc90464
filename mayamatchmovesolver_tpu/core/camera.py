"""Pin-hole camera projection mathematics (Maya-compatible).

Replicates the reference's camera math exactly — frustum from focal
length/film back, the four film-fit modes, and the final projection
matrix (ref: lib/rust/mmscenegraph/src/math/camera.rs:123-327) — as
branchless, batched JAX functions.  film_fit is an integer array so the
whole computation vmaps/shards without data-dependent control flow.

Units follow Maya: film back in inches, focal length in millimetres,
world/clip planes in centimetres.
"""

import jax.numpy as jnp

from mayamatchmovesolver_tpu.core.constants import (
    FilmFit,
    INCH_TO_MM,
    MM_TO_CM,
)


def angle_of_view_radians(film_back_size_mm, focal_length_mm):
    """(ref: lib/rust/mmscenegraph/src/math/camera.rs:124-131)."""
    return 2.0 * jnp.arctan(film_back_size_mm * (0.5 / focal_length_mm))


def frustum_coordinates(
    focal_length_mm,
    film_back_width_inch,
    film_back_height_inch,
    film_offset_x_inch,
    film_offset_y_inch,
    near_clip_plane_cm,
    camera_scale,
):
    """Near-plane frustum (right, left, top, bottom) in cm.

    (ref: lib/rust/mmscenegraph/src/math/camera.rs:153-175).
    """
    film_width_mm = film_back_width_inch * INCH_TO_MM
    film_height_mm = film_back_height_inch * INCH_TO_MM
    offset_x_mm = film_offset_x_inch * INCH_TO_MM
    offset_y_mm = film_offset_y_inch * INCH_TO_MM
    focal_to_near = (near_clip_plane_cm / focal_length_mm) * camera_scale
    right = focal_to_near * (0.5 * film_width_mm + offset_x_mm)
    left = focal_to_near * (-0.5 * film_width_mm + offset_x_mm)
    top = focal_to_near * (0.5 * film_height_mm + offset_y_mm)
    bottom = focal_to_near * (-0.5 * film_height_mm + offset_y_mm)
    return right, left, top, bottom


def film_fit_logic(
    right, left, top, bottom, image_aspect_ratio, film_aspect_ratio, film_fit
):
    """Apply the film-fit mode; returns (scale_x, scale_y, screen dict).

    Branchless port of the reference's match over FilmFit
    (ref: lib/rust/mmscenegraph/src/math/camera.rs:182-242).
    film_fit broadcasts as an integer array (FilmFit values).
    """
    fit = jnp.asarray(film_fit)
    one = jnp.ones_like(image_aspect_ratio)

    is_horizontal = fit == FilmFit.HORIZONTAL
    is_vertical = fit == FilmFit.VERTICAL
    is_fill = fit == FilmFit.FILL
    is_overscan = fit == FilmFit.OVERSCAN
    film_gt_image = film_aspect_ratio > image_aspect_ratio

    width = right - left
    height = top - bottom

    # FILL: wide film letterboxes horizontally, else scales Y.
    fill_x = jnp.where(film_gt_image, film_aspect_ratio / image_aspect_ratio, one)
    fill_y = jnp.where(film_gt_image, one, image_aspect_ratio / film_aspect_ratio)
    fill_sx = jnp.where(film_gt_image, height * image_aspect_ratio, width)
    fill_sy = jnp.where(
        film_gt_image,
        height,
        (width * (film_aspect_ratio / image_aspect_ratio)) / film_aspect_ratio,
    )

    # OVERSCAN
    over_x = jnp.where(film_gt_image, one, film_aspect_ratio / image_aspect_ratio)
    over_y = jnp.where(film_gt_image, image_aspect_ratio / film_aspect_ratio, one)
    over_sx = jnp.where(
        film_gt_image, width, width * (image_aspect_ratio / film_aspect_ratio)
    )
    over_sy = jnp.where(film_gt_image, width / image_aspect_ratio, height)

    scale_x = jnp.where(
        is_horizontal,
        image_aspect_ratio / film_aspect_ratio,
        jnp.where(
            is_vertical,
            1.0 / (image_aspect_ratio / film_aspect_ratio),
            jnp.where(is_fill, fill_x, jnp.where(is_overscan, over_x, one)),
        ),
    )
    scale_y = jnp.where(
        is_fill, fill_y, jnp.where(is_overscan, over_y, one)
    )
    size_x = jnp.where(
        is_horizontal,
        width,
        jnp.where(
            is_vertical,
            height * image_aspect_ratio,
            jnp.where(is_fill, fill_sx, over_sx),
        ),
    )
    size_y = jnp.where(
        is_horizontal,
        width / image_aspect_ratio,
        jnp.where(
            is_vertical,
            height,
            jnp.where(is_fill, fill_sy, over_sy),
        ),
    )

    return (
        scale_x,
        scale_y,
        {
            "size_x_mm": size_x,
            "size_y_mm": size_y,
            "right": right * scale_x,
            "left": left * scale_x,
            "top": top * scale_y,
            "bottom": bottom * scale_y,
        },
    )


def projection_matrix(
    focal_length_mm,
    film_back_width_inch,
    film_back_height_inch,
    film_offset_x_inch,
    film_offset_y_inch,
    image_width_pixels,
    image_height_pixels,
    film_fit,
    near_clip_plane_cm,
    far_clip_plane_cm,
    camera_scale,
):
    """Maya-compatible 4x4 projection matrix, batched over leading dims.

    (ref: lib/rust/mmscenegraph/src/math/camera.rs:244-327; validated
    against its unit test values.)  Note the reference hard-codes
    near_clip = 0.1cm when evaluating the scene graph
    (ref: lib/rust/mmscenegraph/src/math/dag.rs:152-154); callers follow
    that convention, not this function.
    """
    focal_length_mm = jnp.asarray(focal_length_mm, jnp.result_type(float))
    film_aspect = film_back_width_inch / film_back_height_inch
    image_aspect = image_width_pixels / image_height_pixels
    right, left, top, bottom = frustum_coordinates(
        focal_length_mm,
        film_back_width_inch,
        film_back_height_inch,
        film_offset_x_inch,
        film_offset_y_inch,
        near_clip_plane_cm,
        camera_scale,
    )
    scale_x, scale_y, screen = film_fit_logic(
        right, left, top, bottom, image_aspect, film_aspect, film_fit
    )

    shape = jnp.shape(screen["size_x_mm"])
    dtype = screen["size_x_mm"].dtype
    zero = jnp.zeros(shape, dtype)
    near = jnp.broadcast_to(jnp.asarray(near_clip_plane_cm, dtype), shape)
    far = jnp.broadcast_to(jnp.asarray(far_clip_plane_cm, dtype), shape)

    m00 = 1.0 / (screen["size_x_mm"] * 0.5) * MM_TO_CM
    m11 = 1.0 / (screen["size_y_mm"] * 0.5) * MM_TO_CM
    m20 = (
        (screen["right"] + screen["left"]) / (screen["right"] - screen["left"])
    ) * scale_x
    m21 = (
        (screen["top"] + screen["bottom"]) / (screen["top"] - screen["bottom"])
    ) * scale_y
    m22 = (far + near) / (far - near)
    m23 = 2.0 * far * near / (far - near)

    # The reference lists this matrix row-major in Maya's ROW-vector
    # convention (ref: lib/rust/mmscenegraph/src/math/camera.rs:253-278)
    # but then uses it with column vectors, which silently drops the
    # film-offset terms (m20/m21, the (right+left)/(right-left) frustum
    # asymmetry) from the screen x/y — offsets only perturb z_ndc there.
    # Maya itself (the reference's authoritative MayaDAG backend, e.g.
    # MFnCamera projection used by adjust_measureErrors.cpp:118-246)
    # evaluates p_row @ M, where M[2][0]/M[2][1] DO pan the image.  We
    # therefore place the offset terms at their column-convention
    # transpose positions so `proj @ p` matches Maya: with zero film
    # offset m20 == m21 == 0 and the matrices agree exactly.
    rows = [
        jnp.stack([m00, zero, m20, zero], axis=-1),
        jnp.stack([zero, m11, m21, zero], axis=-1),
        jnp.stack([zero, zero, m22, m23], axis=-1),
        jnp.stack([zero, zero, zero - 1.0, zero], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def marker_film_fit_scale(film_fit, film_aspect_ratio, render_aspect_ratio):
    """Per-axis multipliers applied to marker positions so they live in the
    same screen space as reprojected points.

    (ref: lib/rust/mmscenegraph/src/scene/flat.rs:73-97
    `scale_xy_with_film_fit`, and the Maya-side backward correction
    src/mmSolver/mayahelper/maya_camera.cpp:322.)
    Returns (scale_x, scale_y) broadcasting with the inputs.
    """
    fit = jnp.asarray(film_fit)
    film_aspect_ratio = jnp.asarray(film_aspect_ratio, jnp.result_type(float))
    ratio = render_aspect_ratio / film_aspect_ratio
    one = jnp.ones_like(ratio)
    film_gt_render = film_aspect_ratio > render_aspect_ratio

    scale_x = jnp.where(
        fit == FilmFit.VERTICAL,
        1.0 / ratio,
        jnp.where(
            (fit == FilmFit.FILL) & film_gt_render,
            1.0 / ratio,
            jnp.where((fit == FilmFit.OVERSCAN) & ~film_gt_render, 1.0 / ratio, one),
        ),
    )
    scale_y = jnp.where(
        fit == FilmFit.HORIZONTAL,
        ratio,
        jnp.where(
            (fit == FilmFit.FILL) & ~film_gt_render,
            ratio,
            jnp.where((fit == FilmFit.OVERSCAN) & film_gt_render, ratio, one),
        ),
    )
    return scale_x, scale_y
