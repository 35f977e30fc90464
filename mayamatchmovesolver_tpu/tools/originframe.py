"""Set-camera-origin-frame: rigid re-basing of a solved shot.

Capability of the reference's setcameraoriginframe tool
(ref: python/mmSolver/tools/setcameraoriginframe/lib.py:122
set_camera_origin_frame — parents the camera + bundles under an
'origin' group whose inverse transform places the chosen frame's
camera at the world origin, optionally applying scene scale; the same
normalization the camera solver runs at solvercamerautils.py:730).

Operates on the scene graph's TRS data directly: every camera position/
orientation and every bundle position is transformed by the inverse of
the origin frame's camera pose, then scaled.
"""

import jax.numpy as jnp
import numpy as np

from mayamatchmovesolver_tpu.core import transform as tfm_math
from mayamatchmovesolver_tpu.scene import flatscene
from mayamatchmovesolver_tpu.tools import reparent as reparent_mod


def set_camera_origin_frame(sg, camera, origin_frame_index=0,
                            scene_scale=1.0, bundles=None):
    """Re-base the shot so `camera` at the origin frame is the world
    origin with identity orientation, scaling the scene by
    scene_scale.  Writes new TRS values into the SceneGraph builder
    for the camera and every bundle.  Reprojection is invariant under
    this similarity transform (tested).
    """
    from mayamatchmovesolver_tpu.scene import attrblock

    scene, attrs = sg.bake()
    frames = np.arange(sg.num_frames)
    ev = flatscene.evaluate_jit(scene, attrs, jnp.asarray(frames))
    cam_world = np.asarray(ev.tfm_world[camera.index])  # (F, 4, 4)
    origin = cam_world[int(origin_frame_index)].copy()
    # Remove scale from the origin pose (rigid re-base only).
    norms = np.linalg.norm(origin[:3, :3], axis=0)
    origin[:3, :3] /= norms
    origin_inv = np.asarray(tfm_math.affine_inverse(origin))

    s = float(scene_scale)

    def rebase_matrix(world):
        out = np.einsum("ij,...jk->...ik", origin_inv, world)
        out[..., :3, 3] *= s
        return out

    new_cam = rebase_matrix(cam_world)
    trs = reparent_mod.local_trs_under_parent(
        new_cam, None, rotate_order=camera.rotate_order
    )
    _write_trs(sg, camera, frames, trs)

    bundles = list(sg._bundles) if bundles is None else list(bundles)
    for b in bundles:
        bnd_world = np.asarray(ev.tfm_world[b.index])
        new_bnd = rebase_matrix(bnd_world)
        trs = reparent_mod.local_trs_under_parent(
            new_bnd, None, rotate_order=b.rotate_order
        )
        _write_trs(sg, b, frames, trs)
    return origin_inv


def _write_trs(sg, node, frames, trs):
    from mayamatchmovesolver_tpu.scene import attrblock

    if node.parent is not None:
        raise ValueError(
            "set_camera_origin_frame writes local TRS; %r must be a "
            "root node (reparent it first)" % node.name
        )
    for name, values in trs.items():
        code = node.attr(name).code
        if attrblock.is_static_code(code):
            sg._attr_builder.set_value(code, float(np.mean(values)))
        else:
            for fi, v in zip(frames, values):
                sg._attr_builder.set_value(code, float(v), frame=fi)
