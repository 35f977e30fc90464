"""Bundle triangulation from marker observations.

Counterpart of the reference's triangulate-bundle tool and API
(ref: python/mmSolver/_api/triangulatebundle.py,
python/mmSolver/tools/triangulatebundle, and the per-bundle
_triangulate_bundles step of camera_solve,
solvercamerautils.py:690): place 3D bundles by DLT triangulation from
their 2D marker tracks through the evaluated cameras.
"""

import jax.numpy as jnp
import numpy as np

from mayamatchmovesolver_tpu.scene import flatscene
from mayamatchmovesolver_tpu.solver import linalg


def triangulate_markers(scene, attrs, frame_indices):
    """DLT-triangulate every marker's bundle position from all frames.

    Uses the evaluated view-projection matrices: for observation
    (m, f) with marker coords (u, v) in NDC*0.5 space, rows
    u*P3 - 0.5*P1 and v*P3 - 0.5*P2 constrain the homogeneous point.
    Returns ((M, 3) positions, (M,) condition ok mask).
    """
    frame_indices = jnp.asarray(frame_indices, dtype=jnp.int32)
    ev = flatscene.evaluate_jit(scene, attrs, frame_indices)

    view_proj = jnp.einsum(
        "cfij,cfjk->cfik", ev.cam_proj, ev.cam_world_inv
    )  # (C, F, 4, 4)
    vp = view_proj[scene.mkr_cam_index]  # (M, F, 4, 4)
    uv = ev.marker_xy  # (M, F, 2) — markers live in NDC*0.5 space
    mask = (ev.marker_enable > 0.5) & (ev.marker_weight > 0.0)

    p1 = vp[..., 0, :]
    p2 = vp[..., 1, :]
    p3 = vp[..., 3, :]  # w row
    u = uv[..., 0:1]
    v = uv[..., 1:2]
    row_u = u * p3 - 0.5 * p1  # (M, F, 4)
    row_v = v * p3 - 0.5 * p2
    w = mask[..., None].astype(row_u.dtype)
    rows = jnp.concatenate([row_u * w, row_v * w], axis=1)  # (M, 2F, 4)
    ata = jnp.einsum("mfi,mfj->mij", rows, rows)
    x = linalg.smallest_eigenvector(ata)  # (M, 4)
    denom = jnp.where(jnp.abs(x[..., 3:]) < 1e-12, 1e-12, x[..., 3:])
    points = x[..., :3] / denom
    ok = jnp.sum(mask, axis=1) >= 2
    return points, ok


def triangulate_into_attrs(scene, attrs, frame_indices,
                           marker_mask=None):
    """Triangulate and scatter positions into the attr block using only
    baked scene arrays (no scene-graph handle needed): each marker's
    bundle transform's tx/ty/tz attr cells receive the DLT solution.
    Animated position channels are written across ALL frames (a
    triangulated bundle is a static point).  Returns (attrs, ok)."""
    points, ok = triangulate_markers(scene, attrs, frame_indices)
    ok = np.asarray(ok)
    if marker_mask is not None:
        ok = ok & np.asarray(marker_mask, bool)
    points = np.asarray(points)
    static = np.array(attrs.static_values)
    anim = np.array(attrs.anim_values)
    bnd_tfm = np.asarray(scene.bnd_tfm_index)
    tfm_codes = np.asarray(scene.tfm_attr_codes)
    mkr_bnd = np.asarray(scene.mkr_bnd_index)
    for mi in range(points.shape[0]):
        if not ok[mi]:
            continue
        codes = tfm_codes[bnd_tfm[mkr_bnd[mi]], 0:3]  # tx ty tz
        for ci, code in enumerate(codes):
            if code < 0:
                continue
            if code % 2 == 0:
                static[code // 2] = points[mi, ci]
            else:
                anim[code // 2, :] = points[mi, ci]
    return (
        attrs._replace(static_values=jnp.asarray(static),
                       anim_values=jnp.asarray(anim)),
        ok,
    )


def triangulate_and_update(scene_graph, scene, attrs, frame_indices):
    """Triangulate and write positions into the attr block for every
    bundle that is a root-level transform (static tx/ty/tz attrs)."""
    points, ok = triangulate_markers(scene, attrs, frame_indices)
    static = np.array(attrs.static_values)
    points = np.asarray(points)
    ok = np.asarray(ok)
    for mkr in scene_graph._markers:
        b = mkr.bundle
        if b.parent is not None or not ok[mkr.mkr_index]:
            continue
        for ci, ch in enumerate(("tx", "ty", "tz")):
            code = b.attr(ch).code
            if code % 2 == 0:
                static[code // 2] = points[mkr.mkr_index, ci]
    return attrs._replace(static_values=jnp.asarray(static)), ok
