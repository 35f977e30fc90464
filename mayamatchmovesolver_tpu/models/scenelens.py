"""Binding lens models to scene cameras with solvable parameters.

The reference threads LensModel objects from Maya lens-node networks
into the solver (ref: src/mmSolver/mayahelper/maya_lens_model_utils.cpp
constructLensModelList, used at adjust_base.cpp:1002, applied at
adjust_measureErrors.cpp:464-480).  Here a SceneLens maps each camera to
a 3DE model type plus packed attribute codes for every lens parameter,
so lens parameters live in the AttrBlock like any other attribute — and
are therefore solvable by bundle adjustment (BASELINE config #4).
"""

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mayamatchmovesolver_tpu.models import base, tde
from mayamatchmovesolver_tpu.scene.attrblock import ATTR_NONE
from mayamatchmovesolver_tpu.scene import flatscene as flatscene_mod
from mayamatchmovesolver_tpu.scene.attrblock import gather_attr_values

LENS_MODEL_NONE = ""
LENS_MODEL_CLASSIC = "tde_classic"
LENS_MODEL_RADIAL_DEG4 = "tde_radial_std_deg4"
LENS_MODEL_ANAMORPHIC_DEG4 = "tde_anamorphic_std_deg4"
LENS_MODEL_ANAMORPHIC_DEG4_RESCALED = "tde_anamorphic_std_deg4_rescaled"

_MODEL_FIELDS = {
    LENS_MODEL_CLASSIC: tde.TdeClassic._fields,
    LENS_MODEL_RADIAL_DEG4: tde.TdeRadialStdDeg4._fields,
    LENS_MODEL_ANAMORPHIC_DEG4: tde.TdeAnamorphicStdDeg4._fields,
    LENS_MODEL_ANAMORPHIC_DEG4_RESCALED:
        tde.TdeAnamorphicStdDeg4Rescaled._fields,
}
_MODEL_DEFAULTS = {
    LENS_MODEL_CLASSIC: tde.TdeClassic.create(),
    LENS_MODEL_RADIAL_DEG4: tde.TdeRadialStdDeg4.create(),
    LENS_MODEL_ANAMORPHIC_DEG4: tde.TdeAnamorphicStdDeg4.create(),
    LENS_MODEL_ANAMORPHIC_DEG4_RESCALED:
        tde.TdeAnamorphicStdDeg4Rescaled.create(),
}
# param slots: model params then pixel_aspect in the last slot.
MAX_LENS_PARAMS = 1 + max(len(f) for f in _MODEL_FIELDS.values())


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SceneLens:
    """Per-camera lens bindings (a pytree; model types are static)."""

    model_types: Tuple[str, ...] = dataclasses.field(
        metadata={"static": True}
    )
    param_codes: jax.Array = None  # (C, MAX_LENS_PARAMS) int32

    def has_any(self):
        return any(t != LENS_MODEL_NONE for t in self.model_types)


def attach_lens(scene_graph, camera, model_type, **param_values):
    """Create lens parameter attributes on the camera node.

    Values may be scalars (static) or per-frame arrays (animated), like
    all other attributes.  Returns dict name -> Attribute (solvable).
    """
    from mayamatchmovesolver_tpu.scene.scenegraph import Attribute

    if model_type not in _MODEL_FIELDS:
        raise ValueError("unknown lens model type: %r" % model_type)
    fields = _MODEL_FIELDS[model_type]
    defaults = _MODEL_DEFAULTS[model_type]
    created = {}
    for name in fields:
        value = param_values.pop(name, float(getattr(defaults, name)))
        code = scene_graph._attr_builder.add(value)
        attr = Attribute(camera, "lens_" + name, code)
        camera.attrs["lens_" + name] = attr
        created[name] = attr
    pa = param_values.pop("pixel_aspect", 1.0)
    code = scene_graph._attr_builder.add(pa)
    attr = Attribute(camera, "lens_pixel_aspect", code)
    camera.attrs["lens_pixel_aspect"] = attr
    created["pixel_aspect"] = attr
    if param_values:
        raise ValueError(
            "unknown lens parameters for %s: %r"
            % (model_type, sorted(param_values))
        )
    camera.lens_model_type = model_type
    return created


def bake_scene_lens(scene_graph) -> SceneLens:
    """Collect lens bindings after the scene graph is built."""
    types = []
    codes = np.full(
        (len(scene_graph._cameras), MAX_LENS_PARAMS), ATTR_NONE,
        dtype=np.int32,
    )
    for ci, cam in enumerate(scene_graph._cameras):
        model_type = getattr(cam, "lens_model_type", LENS_MODEL_NONE)
        types.append(model_type)
        if model_type == LENS_MODEL_NONE:
            continue
        for pi, name in enumerate(_MODEL_FIELDS[model_type]):
            codes[ci, pi] = cam.attrs["lens_" + name].code
        codes[ci, MAX_LENS_PARAMS - 1] = cam.attrs[
            "lens_pixel_aspect"
        ].code
    return SceneLens(
        model_types=tuple(types), param_codes=jnp.asarray(codes)
    )


def _film_back_for_camera(scene, attrs, cam_index, frame_indices,
                          pixel_aspect):
    cv = gather_attr_values(
        attrs, scene.cam_attr_codes[cam_index], frame_indices
    )  # (8, F)
    names = flatscene_mod.CAM_ATTRS
    vals = {n: cv[i] for i, n in enumerate(names)}
    return base.FilmBack(
        film_back_width_cm=vals["sensor_width_mm"] * 0.1,
        film_back_height_cm=vals["sensor_height_mm"] * 0.1,
        lens_center_offset_x_cm=vals["lens_offset_x_mm"] * 0.1,
        lens_center_offset_y_cm=vals["lens_offset_y_mm"] * 0.1,
        pixel_aspect=pixel_aspect,
    )


def _build_model(model_type, values):
    cls = {
        LENS_MODEL_CLASSIC: tde.TdeClassic,
        LENS_MODEL_RADIAL_DEG4: tde.TdeRadialStdDeg4,
        LENS_MODEL_ANAMORPHIC_DEG4: tde.TdeAnamorphicStdDeg4,
        LENS_MODEL_ANAMORPHIC_DEG4_RESCALED:
            tde.TdeAnamorphicStdDeg4Rescaled,
    }[model_type]
    return cls(*values)


def apply_scene_lens(scene_lens: SceneLens, scene, attrs, frame_indices,
                     point_xy, mkr_cam_index, direction="distort"):
    """Distort (or undistort) projected points through each camera's lens.

    point_xy: (M, F, 2) marker-space positions.  The solver distorts the
    *projected* point to compare against the observed (distorted) marker
    (ref: adjust_measureErrors.cpp:464-480).  NaN outputs fall back to
    the undistorted position (ref: NaN guard at
    adjust_measureErrors.cpp:250-259).
    """
    if not scene_lens.has_any():
        return point_xy

    out = point_xy
    for ci, model_type in enumerate(scene_lens.model_types):
        if model_type == LENS_MODEL_NONE:
            continue
        n_params = len(_MODEL_FIELDS[model_type])
        pv = gather_attr_values(
            attrs, scene_lens.param_codes[ci, :n_params], frame_indices
        )  # (P, F)
        pa = gather_attr_values(
            attrs,
            scene_lens.param_codes[ci, MAX_LENS_PARAMS - 1:MAX_LENS_PARAMS],
            frame_indices,
        )[0]
        # ATTR_NONE pixel aspect gathers to 0 -> default 1.0.
        pa = jnp.where(
            scene_lens.param_codes[ci, MAX_LENS_PARAMS - 1] < 0, 1.0, pa
        )
        model = _build_model(model_type, [pv[i] for i in range(n_params)])
        fb = _film_back_for_camera(scene, attrs, ci, frame_indices, pa)

        if direction == "distort":
            mapped = tde.distort(model, fb, point_xy)
        else:
            mapped = tde.undistort(model, fb, point_xy)
        mapped = jnp.where(jnp.isfinite(mapped), mapped, point_xy)
        is_cam = (mkr_cam_index == ci)[:, None, None]
        out = jnp.where(is_cam, mapped, out)
    return out
