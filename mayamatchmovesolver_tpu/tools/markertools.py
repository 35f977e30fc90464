"""Marker/bundle utility operations.

Capabilities of the reference's small marker tools:
  - averagemarker (ref: python/mmSolver/tools/averagemarker/lib.py:29)
  - duplicatemarker (ref: tools/duplicatemarker)
  - markerbundlerename (ref: tools/markerbundlerename/lib.py:64
    rename_markers_and_bundles)
  - convertmarker: transform -> marker by reprojection
    (ref: tools/convertmarker/lib.py convert_nodes_to_marker_data_list)
  - reprojectbundle: push a bundle onto its marker's camera ray
    (ref: tools/reprojectbundle/lib.py reproject_bundle_current_frame)
"""

import jax.numpy as jnp
import numpy as np

from mayamatchmovesolver_tpu.scene import flatscene


def average_marker(marker_xy, enable=None):
    """Average several marker tracks into one
    (ref: tools/averagemarker/lib.py:29 — per-frame mean).
    marker_xy: (K, F, 2); enable: optional (K, F) mask.
    Returns ((F, 2) positions, (F,) any-enabled mask)."""
    marker_xy = jnp.asarray(marker_xy)
    if enable is None:
        return (
            jnp.mean(marker_xy, axis=0),
            jnp.ones(marker_xy.shape[1], bool),
        )
    w = jnp.asarray(enable, marker_xy.dtype)[..., None]
    count = jnp.maximum(jnp.sum(w, axis=0), 1e-9)
    avg = jnp.sum(marker_xy * w, axis=0) / count
    return avg, jnp.sum(w[..., 0], axis=0) > 0.5


def create_average_marker(sg, markers, name="avg_marker", bundle=None):
    """Create a marker averaging existing markers' screen tracks
    (ref: averagemarker/tool.py main — new marker + bundle at the
    average position)."""
    from mayamatchmovesolver_tpu.scene import attrblock

    scene, attrs = sg.bake()
    frames = np.arange(sg.num_frames)
    xy = []
    en = []
    for m in markers:
        codes = np.array([m.attr("tx").code, m.attr("ty").code,
                          m.attr("enable").code])
        vals = np.asarray(
            attrblock.gather_attr_values(attrs, codes, frames)
        )
        xy.append(vals[:2].T)
        en.append(vals[2])
    avg, any_on = average_marker(np.stack(xy), np.stack(en))
    cam = markers[0].camera
    if bundle is None:
        bundle = sg.create_bundle(name + "_bnd")
    return sg.create_marker(
        name, camera=cam, bundle=bundle,
        tx=np.asarray(avg[:, 0]), ty=np.asarray(avg[:, 1]),
        enable=np.asarray(any_on, np.float64),
    )


def duplicate_marker(sg, marker, name=None):
    """Copy a marker's track onto a new marker sharing the camera and
    bundle (ref: tools/duplicatemarker/lib.py)."""
    from mayamatchmovesolver_tpu.scene import attrblock

    scene, attrs = sg.bake()
    frames = np.arange(sg.num_frames)
    values = {}
    for ch in ("tx", "ty", "weight", "enable"):
        code = marker.attr(ch).code
        v = np.asarray(attrblock.gather_attr_values(
            attrs, np.array([code]), frames
        ))[0]
        values[ch] = float(v[0]) if attrblock.is_static_code(code) else v
    return sg.create_marker(
        name or (marker.name + "_copy"), camera=marker.camera,
        bundle=marker.bundle, group=marker.group, **values
    )


def rename_markers_and_bundles(markers, base_name, marker_suffix="_MKR",
                               bundle_suffix="_BND", start=1):
    """Consistent numbered rename of marker/bundle pairs
    (ref: markerbundlerename/lib.py:64 — '<name>_NN_MKR' plus the
    matching bundle).  Returns the new (marker, bundle) name pairs."""
    pairs = []
    number = int(start)
    for m in markers:
        mkr_name = "%s_%02d%s" % (base_name, number, marker_suffix)
        bnd_name = "%s_%02d%s" % (base_name, number, bundle_suffix)
        graph = m.graph
        for node, new_name in ((m, mkr_name), (m.bundle, bnd_name)):
            if node is None or node.name == new_name:
                continue
            if new_name in graph._names:
                raise ValueError("name already used: %r" % new_name)
            graph._names.discard(node.name)
            graph._names.add(new_name)
            node.name = new_name
        pairs.append((mkr_name, bnd_name))
        number += 1
    return pairs


def marker_from_transform(scene, attrs, frame_indices, tfm_index,
                          cam_index=0):
    """A transform's screen track — the data of convertmarker
    (ref: tools/convertmarker/lib.py — reprojects a transform into
    marker positions per frame).  Returns (marker_xy (F, 2),
    behind_camera (F,) bool)."""
    from mayamatchmovesolver_tpu.tools import screenspace

    ev = flatscene.evaluate(scene, attrs, jnp.asarray(frame_indices))
    points = ev.tfm_world[tfm_index, :, :3, 3]
    xy, depth = screenspace.world_to_screen(ev, points,
                                            cam_index=cam_index)
    return xy, depth <= 0.0


def reproject_bundle(scene, attrs, frame_indices, marker_index,
                     frame_for_depth=0):
    """Move a bundle onto the camera ray through its marker, keeping
    its current depth (ref: tools/reprojectbundle/lib.py — snap the
    bundle to the marker's ray at the current frame).  Returns the new
    (3,) world position."""
    from mayamatchmovesolver_tpu.tools import screenspace

    ev = flatscene.evaluate(scene, attrs, jnp.asarray(frame_indices))
    cam_index = int(scene.mkr_cam_index[marker_index])
    bnd_index = int(scene.mkr_bnd_index[marker_index])
    bnd_world = ev.bnd_world_point[bnd_index]  # (F, 3)
    _, depth = screenspace.world_to_screen(ev, bnd_world,
                                           cam_index=cam_index)
    new_world = screenspace.screen_to_world(
        ev, ev.marker_xy[marker_index], depth, cam_index=cam_index
    )
    return np.asarray(new_world[frame_for_depth])
