"""Camera calibration from one/two vanishing points.

Port of the reference's calibrate module
(ref: src/mmSolver/calibrate/calibrate_common.cpp:109-385,
vanishing_point.cpp:50-150), which implements Guillou et al. 2000 and
Orghidan et al. 2012.  Coordinates: 'image normalized' space — x in
[-0.5, 0.5] horizontally, y scaled by the film back aspect, principal
point near (0,0) — exactly the space the reference's mmCameraCalibrate
node feeds in.
"""

import enum
from typing import NamedTuple

import jax
import jax.numpy as jnp


class SceneScaleMode(enum.IntEnum):
    """(ref: calibrate_common.h SceneScaleMode.)"""

    UNIFORM_SCALE = 0
    CAMERA_HEIGHT = 1


class CameraCalibration(NamedTuple):
    focal_length_factor: jax.Array  # 2 * focal_mm / filmback_w_mm
    focal_length_mm: jax.Array
    rotation_matrix: jax.Array  # (3, 3) camera orientation (world from cam)
    translation: jax.Array  # (3,) camera position
    ok: jax.Array  # bool validity


def focal_length_from_two_vanishing_points(vp_a, vp_b, principal_point):
    """(ref: calcFocalLength, calibrate_common.cpp:109-139.)

    Returns (focal_factor, ok).  All points (..., 2).
    """
    d = vp_a - vp_b
    d_dir = d / jnp.maximum(
        jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12
    )
    p_vpb = principal_point - vp_b
    proj = jnp.sum(d_dir * p_vpb, axis=-1)
    puv = proj[..., None] * d_dir + vp_b
    pp_uv = jnp.linalg.norm(principal_point - puv, axis=-1)
    # Signed distances along the line: for a valid configuration the
    # foot Puv lies BETWEEN the vanishing points, so the signed product
    # is negative and -product equals the reference's unsigned
    # |vpA-Puv|*|vpB-Puv| (calibrate_common.cpp:126-136); when both VPs
    # fall on the same side the signed form correctly yields
    # focal^2 < 0 where the unsigned form would not.
    ta = jnp.sum((vp_a - puv) * d_dir, axis=-1)
    tb = jnp.sum((vp_b - puv) * d_dir, axis=-1)
    focal_sq = -(ta * tb) - pp_uv * pp_uv
    ok = focal_sq > 0
    return jnp.sqrt(jnp.maximum(focal_sq, 1e-12)), ok


def rotation_from_two_vanishing_points(vp_a, vp_b, principal_point,
                                       focal_factor):
    """(ref: calcCameraRotationMatrix, calibrate_common.cpp:151-191.)
    Columns: x-axis toward vpA direction, y-axis toward vpB direction,
    z-axis their cross product; camera looks down -z."""
    f = focal_factor
    o_vpa = jnp.concatenate(
        [vp_a - principal_point, -f[..., None]], axis=-1
    )
    o_vpb = jnp.concatenate(
        [vp_b - principal_point, -f[..., None]], axis=-1
    )
    a_dir = o_vpa / jnp.linalg.norm(o_vpa, axis=-1, keepdims=True)
    b_dir = o_vpb / jnp.linalg.norm(o_vpb, axis=-1, keepdims=True)
    w = jnp.cross(a_dir, b_dir)
    return jnp.stack([a_dir, b_dir, w], axis=-1)  # columns


def second_vanishing_point_from_horizon(
    vp_a, principal_point, horizon_a, horizon_b, focal_factor
):
    """Derive the second VP for one-point perspective: it lies along the
    horizon direction and satisfies (vpA-P).(vpB-P) = -f^2
    (ref: oneVanishingPoint, vanishing_point.cpp:50-101)."""
    d = horizon_b - horizon_a
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
    u = vp_a - principal_point
    denom = jnp.sum(u * d, axis=-1)
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    s = (-(focal_factor**2) - jnp.sum(u * u, axis=-1)) / denom
    return vp_a + s[..., None] * d


def translation_from_origin_point(origin_point, principal_point,
                                  focal_factor):
    """(ref: calcTranslationVector, calibrate_common.cpp:267-281) —
    the camera sits at unit distance along -z from the chosen world
    origin; the origin's screen position fixes x/y."""
    inv_f = 1.0 / focal_factor  # tan(aov/2) = fbw/(2*focal)
    rel = origin_point - principal_point
    return jnp.stack(
        [
            inv_f * rel[..., 0],
            inv_f * rel[..., 1],
            -jnp.ones_like(rel[..., 0]),
        ],
        axis=-1,
    )


def apply_scene_scale(translation, mode, distance_cm):
    """(ref: applySceneScale, calibrate_common.cpp:285-311.)"""
    mode = int(mode)
    if mode == SceneScaleMode.UNIFORM_SCALE:
        return translation * distance_cm
    if mode == SceneScaleMode.CAMERA_HEIGHT:
        factor = distance_cm / jnp.maximum(
            jnp.abs(translation[..., 1]), 1e-12
        )
        return translation * factor[..., None]
    raise ValueError("invalid SceneScaleMode: %r" % mode)


def calibrate_two_vanishing_points(
    focal_length_mm,
    film_back_width_mm,
    film_back_height_mm,
    origin_point,
    principal_point,
    vanishing_point_a,
    vanishing_point_b,
    scene_scale_mode=SceneScaleMode.UNIFORM_SCALE,
    scene_scale_distance_cm=1.0,
) -> CameraCalibration:
    """(ref: twoVanishingPoints, vanishing_point.cpp:103-150.)  Solves
    focal length + rotation + position from two orthogonal VPs."""
    focal_factor, ok = focal_length_from_two_vanishing_points(
        vanishing_point_a, vanishing_point_b, principal_point
    )
    # Fall back to the user's focal length when the VP pair is invalid
    # (the reference errors out; we keep it branchless).
    user_factor = 2.0 * (
        jnp.asarray(focal_length_mm, jnp.result_type(float))
        / film_back_width_mm
    )
    focal_factor = jnp.where(ok, focal_factor, user_factor)

    rot = rotation_from_two_vanishing_points(
        vanishing_point_a, vanishing_point_b, principal_point, focal_factor
    )
    # The rotation above is world-from-camera-axes; camera transform is
    # its transpose applied to the camera-space translation.
    t_cam = translation_from_origin_point(
        origin_point, principal_point, focal_factor
    )
    # Camera position in world space: R @ t_cam (the reference multiplies
    # through the inverse transform; ref: calcCameraParameters:340-358).
    position = jnp.einsum("...ij,...j->...i", rot, t_cam)
    position = apply_scene_scale(
        position, scene_scale_mode, scene_scale_distance_cm
    )
    focal_mm = focal_factor * film_back_width_mm / 2.0
    return CameraCalibration(
        focal_length_factor=focal_factor,
        focal_length_mm=focal_mm,
        rotation_matrix=rot,
        translation=position,
        ok=ok,
    )


def calibrate_one_vanishing_point(
    focal_length_mm,
    film_back_width_mm,
    film_back_height_mm,
    origin_point,
    principal_point,
    vanishing_point_a,
    horizon_point_a,
    horizon_point_b,
    scene_scale_mode=SceneScaleMode.UNIFORM_SCALE,
    scene_scale_distance_cm=1.0,
) -> CameraCalibration:
    """(ref: oneVanishingPoint, vanishing_point.cpp:50-101) — focal
    length is taken from the user; the second VP comes from the horizon
    line."""
    focal_factor = 2.0 * (
        jnp.asarray(focal_length_mm, jnp.result_type(float))
        / film_back_width_mm
    )
    vp_b = second_vanishing_point_from_horizon(
        vanishing_point_a, principal_point, horizon_point_a,
        horizon_point_b, focal_factor,
    )
    rot = rotation_from_two_vanishing_points(
        vanishing_point_a, vp_b, principal_point, focal_factor
    )
    t_cam = translation_from_origin_point(
        origin_point, principal_point, focal_factor
    )
    position = jnp.einsum("...ij,...j->...i", rot, t_cam)
    position = apply_scene_scale(
        position, scene_scale_mode, scene_scale_distance_cm
    )
    return CameraCalibration(
        focal_length_factor=focal_factor,
        focal_length_mm=jnp.asarray(focal_length_mm,
                                    jnp.result_type(float)),
        rotation_matrix=rot,
        translation=position,
        ok=jnp.asarray(True),
    )
