"""Lens deformer tests (ref: mmLensDeformer node behavior,
src/mmSolver/node/MMLensDeformerNode.cpp:130-227)."""

import numpy as np

from mayamatchmovesolver_tpu import models
from mayamatchmovesolver_tpu.models import tde
from mayamatchmovesolver_tpu.ops import lensdeform


def _setup():
    fb = models.FilmBack.create()
    model = models.TdeClassic.create(distortion=0.2)
    pts = np.array(
        [[0.3, 0.2, 1.5], [-0.4, 0.1, -2.0], [0.0, 0.0, 0.5]]
    )
    return fb, model, pts


def test_deform_matches_undistort_and_keeps_z():
    fb, model, pts = _setup()
    out = np.asarray(lensdeform.deform_points(model, fb, pts))
    want_xy = np.asarray(tde.undistort(model, fb, pts[:, :2]))
    np.testing.assert_allclose(out[:, :2], want_xy, atol=1e-12)
    np.testing.assert_allclose(out[:, 2], pts[:, 2])


def test_deform_envelope_blend():
    fb, model, pts = _setup()
    full = np.asarray(lensdeform.deform_points(model, fb, pts))
    half = np.asarray(
        lensdeform.deform_points(model, fb, pts, envelope=0.5)
    )
    zero = np.asarray(
        lensdeform.deform_points(model, fb, pts, envelope=0.0)
    )
    np.testing.assert_allclose(zero, pts, atol=1e-12)
    np.testing.assert_allclose(
        half[:, :2], 0.5 * (pts[:, :2] + full[:, :2]), atol=1e-12
    )


def test_evaluate_lens_roundtrip():
    fb, model, pts = _setup()
    xy = pts[:, :2]
    und = lensdeform.evaluate_lens(model, fb, xy, direction="undistort")
    back = lensdeform.evaluate_lens(model, fb, und, direction="distort")
    np.testing.assert_allclose(np.asarray(back), xy, atol=1e-7)
