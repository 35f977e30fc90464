"""Deform geometry through a lens model.

Counterpart of the reference's mmLensDeformer node
(ref: src/mmSolver/node/MMLensDeformerNode.cpp:130-227 — applies
applyModelUndistort to each geometry point's (x, y), keeps z, guards
non-finite output, and lerps by the deformer envelope) and the
mmLensEvaluate node (batch lens evaluation of points).
"""

import jax.numpy as jnp

from mayamatchmovesolver_tpu.models import base as lens_base
from mayamatchmovesolver_tpu.models import tde

__all__ = ["deform_points", "evaluate_lens"]


def deform_points(model, film_back: lens_base.FilmBack, points,
                  envelope=1.0, direction="undistort"):
    """Apply lens distortion to (N, 3) points in screen space.

    x/y move through the lens model, z is untouched; non-finite lens
    output falls back to the input; `envelope` blends input->output
    (ref: MMLensDeformerNode.cpp:205-224).
    """
    points = jnp.asarray(points)
    xy = points[..., :2]
    if direction == "undistort":
        out_xy = tde.undistort(model, film_back, xy)
    else:
        out_xy = tde.distort(model, film_back, xy)
    out_xy = jnp.where(jnp.isfinite(out_xy), out_xy, xy)
    out_xy = xy + envelope * (out_xy - xy)
    return jnp.concatenate([out_xy, points[..., 2:]], axis=-1)


def evaluate_lens(model, film_back: lens_base.FilmBack, xy,
                  direction="undistort"):
    """Batch lens evaluation of (N, 2) screen-space points
    (ref: src/mmSolver/node/MMLensEvaluateNode.cpp)."""
    xy = jnp.asarray(xy)
    if direction == "undistort":
        return tde.undistort(model, film_back, xy)
    return tde.distort(model, film_back, xy)
