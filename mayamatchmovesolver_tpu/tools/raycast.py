"""Ray-cast markers onto mesh geometry.

Capability of the reference's raycastmarker tool
(ref: python/mmSolver/tools/raycastmarker/lib.py — casts each
selected marker's camera ray at a mesh via utils/raytrace
closest_intersect and moves the marker's bundle to the hit point;
supports casting over a frame range and 'unlink if no hit').

The ray math: a marker at screen (x, y) defines the ray from the
camera position through the unprojected point at unit depth
(tools/screenspace.screen_to_world); intersection is the batched
Moller-Trumbore kernel in utils/raytrace.
"""

import jax.numpy as jnp
import numpy as np

from mayamatchmovesolver_tpu.scene import flatscene
from mayamatchmovesolver_tpu.tools import screenspace
from mayamatchmovesolver_tpu.utils import raytrace


def marker_rays(scene, attrs, frame_indices, marker_indices=None):
    """Camera rays through markers: returns (origins (M, F, 3),
    directions (M, F, 3) unit vectors)."""
    ev = flatscene.evaluate_jit(scene, attrs, jnp.asarray(frame_indices))
    if marker_indices is None:
        marker_indices = np.arange(scene.num_markers)
    marker_indices = np.asarray(marker_indices)
    origins = []
    directions = []
    for mi in marker_indices:
        cam_index = int(scene.mkr_cam_index[mi])
        cam_pos = ev.cam_world[cam_index, :, :3, 3]  # (F, 3)
        at_depth = screenspace.screen_to_world(
            ev, ev.marker_xy[mi], jnp.ones(ev.marker_xy.shape[1]),
            cam_index=cam_index,
        )  # (F, 3) point at depth 1
        d = at_depth - cam_pos
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        origins.append(cam_pos)
        directions.append(d)
    return jnp.stack(origins), jnp.stack(directions)


def raycast_markers_to_mesh(scene, attrs, frame_index, vertices,
                            triangles, marker_indices=None,
                            max_distance=None):
    """Hit points for each marker's ray at one frame
    (ref: raycastmarker/lib.py raycast_markers_onto_meshes).

    Returns (positions (M, 3), hit (M,) bool): bundle positions for
    markers whose ray hits the mesh; non-hits keep NaN positions (the
    reference skips/optionally unlinks those markers).
    """
    origins, directions = marker_rays(
        scene, attrs, np.asarray([frame_index]), marker_indices
    )
    o = origins[:, 0]
    d = directions[:, 0]
    hit_pos, _, hit_dist, hit = raytrace.intersect_rays_mesh(
        o, d, vertices, triangles,
        max_dist=np.inf if max_distance is None else max_distance,
    )
    return hit_pos, hit


def apply_raycast_bundles(sg, frame_index, vertices, triangles,
                          markers=None, max_distance=None):
    """Move bundles of markers that hit the mesh (host-side write-back
    like the reference tool's main action).  Returns the hit mask."""
    from mayamatchmovesolver_tpu.scene import attrblock

    scene, attrs = sg.bake()
    markers = list(sg._markers) if markers is None else list(markers)
    marker_indices = np.array([m.mkr_index for m in markers])
    pos, hit = raycast_markers_to_mesh(
        scene, attrs, frame_index, vertices, triangles,
        marker_indices=marker_indices, max_distance=max_distance,
    )
    pos = np.asarray(pos)
    hit = np.asarray(hit)
    for k, m in enumerate(markers):
        if not hit[k]:
            continue
        if m.bundle.parent is not None:
            raise ValueError(
                "raycast writes world positions; bundle %r must be a "
                "root node" % m.bundle.name
            )
        for ci, ch in enumerate(("tx", "ty", "tz")):
            code = m.bundle.attr(ch).code
            if attrblock.is_static_code(code):
                sg._attr_builder.set_value(code, float(pos[k, ci]))
            else:
                sg._attr_builder.set_value(
                    code, float(pos[k, ci]), frame=frame_index
                )
    return hit
