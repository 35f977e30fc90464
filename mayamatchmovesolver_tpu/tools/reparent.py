"""World-preserving reparenting and controller baking.

Capabilities of the reference's reparent2 and createcontroller2 tools
(ref: python/mmSolver/tools/reparent2/lib.py:155 reparent — bake world
matrices, re-parent, re-set local TRS so world motion is unchanged;
tools/createcontroller2 — bake a node's world motion onto a new
'controller' transform, then bake back).  There the baking runs Maya's
DG per frame; here it is a batched matrix decompose over all frames at
once (core/transform.py decompose_matrix).
"""

import jax.numpy as jnp
import numpy as np

from mayamatchmovesolver_tpu.core import transform as tfm_math
from mayamatchmovesolver_tpu.core.constants import RotateOrder
from mayamatchmovesolver_tpu.scene import flatscene
from mayamatchmovesolver_tpu.utils import animcurve


def local_trs_under_parent(child_world, parent_world=None,
                           rotate_order=RotateOrder.XYZ):
    """Local TRS values that reproduce child_world under parent_world.

    child_world: (F, 4, 4) world matrices to preserve.
    parent_world: (F, 4, 4) new parent world matrices (None = world).
    Returns dict of per-frame arrays tx..tz, rx..rz (degrees, euler
    filtered for continuity), sx..sz.
    """
    child_world = jnp.asarray(child_world)
    if parent_world is None:
        local = child_world
    else:
        local = jnp.einsum(
            "fij,fjk->fik",
            tfm_math.affine_inverse(jnp.asarray(parent_world)),
            child_world,
        )
    t, r_deg, s = tfm_math.decompose_matrix(local, int(rotate_order))
    # euler_filter_array unwraps along the last axis: run it per
    # channel over the frame axis.
    r_deg = animcurve.euler_filter_array(np.asarray(r_deg).T).T
    return {
        "tx": np.asarray(t[..., 0]), "ty": np.asarray(t[..., 1]),
        "tz": np.asarray(t[..., 2]),
        "rx": r_deg[..., 0], "ry": r_deg[..., 1], "rz": r_deg[..., 2],
        "sx": np.asarray(s[..., 0]), "sy": np.asarray(s[..., 1]),
        "sz": np.asarray(s[..., 2]),
    }


def reparent(sg, node, new_parent, frame_indices=None):
    """Re-parent `node` under `new_parent` preserving world motion.

    (ref: reparent2/lib.py:155.)  Writes the new local TRS into the
    SceneGraph's attr builder and flips the parent pointer.  Attributes
    that were static but need animation after the reparent are
    promoted by writing per-frame values (static stays static when the
    new locals are constant).
    """
    p = new_parent
    while p is not None:
        if p is node:
            raise ValueError("cannot parent %s under its own "
                             "descendant" % node.name)
        p = p.parent
    scene, attrs = sg.bake()
    if frame_indices is None:
        frame_indices = np.arange(sg.num_frames)
    frame_indices = np.asarray(frame_indices)
    ev = flatscene.evaluate_jit(scene, attrs, jnp.asarray(frame_indices))
    child_world = ev.tfm_world[node.index]
    parent_world = (
        None if new_parent is None else ev.tfm_world[new_parent.index]
    )
    trs = local_trs_under_parent(
        child_world, parent_world, rotate_order=node.rotate_order
    )
    from mayamatchmovesolver_tpu.scene import attrblock

    for name, values in trs.items():
        code = node.attr(name).code
        if attrblock.is_static_code(code):
            if np.ptp(values) > 1e-12:
                raise ValueError(
                    "reparent would animate static attr %s.%s; create "
                    "the node with animated %s first"
                    % (node.name, name, name)
                )
            sg._attr_builder.set_value(code, float(values[0]))
        else:
            for fi, v in zip(frame_indices, values):
                sg._attr_builder.set_value(code, float(v), frame=fi)
    node.parent = new_parent
    return trs


def bake_world_trs(scene, attrs, frame_indices, tfm_index,
                   rotate_order=RotateOrder.XYZ):
    """A transform's world motion as TRS curves (the 'controller' of
    createcontroller2: a world-space duplicate of the node's motion)."""
    ev = flatscene.evaluate_jit(scene, attrs, jnp.asarray(frame_indices))
    return local_trs_under_parent(
        ev.tfm_world[tfm_index], None, rotate_order=rotate_order
    )
