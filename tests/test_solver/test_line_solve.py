"""Line straightness constraints in the solve
(ref capability: mmLineBestFit residuals + Line API objects,
src/mmSolver/node/MMLineBestFitNode.cpp:94, python/mmSolver/_api/line.py).
"""

import numpy as np

import mayamatchmovesolver_tpu.api as mmapi
from mayamatchmovesolver_tpu.core.constants import FilmFit
from mayamatchmovesolver_tpu.scene import SceneGraph
from mayamatchmovesolver_tpu.solver.solve import SolverOptions, solve


def _camera_kwargs():
    return dict(
        tz=10.0, focal_length_mm=35.0, film_fit=FilmFit.HORIZONTAL,
        render_width=1920, render_height=1080,
    )


def _gt_marker_raw(gt_xy):
    """Raw marker tx/ty observing bundles at gt_xy (fronto-parallel
    plane z=0): project through a ground-truth scene, divide out the
    film-fit scale."""
    import jax.numpy as jnp

    from mayamatchmovesolver_tpu.scene import evaluate, flatscene

    gt = SceneGraph(frame_range=(1, 1))
    cam = gt.create_camera("cam", **_camera_kwargs())
    for i, p in enumerate(gt_xy):
        bnd = gt.create_bundle("b%d" % i, tx=float(p[0]),
                               ty=float(p[1]), tz=0.0)
        gt.create_marker("m%d" % i, camera=cam, bundle=bnd)
    scene, attrs = gt.bake()
    ev = evaluate(scene, attrs, jnp.asarray([0]))
    fsx, fsy = flatscene.marker_fit_scale(scene, attrs, jnp.asarray([0]))
    pt = np.array(ev.point_xy[..., 0, :])  # (M, 2)
    return np.stack(
        [pt[:, 0] / np.asarray(fsx)[:, 0],
         pt[:, 1] / np.asarray(fsy)[:, 0]], axis=-1
    )


def _line_scene(n_pts=5, bend=0.6):
    """Five bundles on a rotated world line, the middle ones bent off
    it; markers observe the TRUE (straight) line."""
    sg = SceneGraph(frame_range=(1, 1))
    cam = sg.create_camera("cam", **_camera_kwargs())
    t = np.linspace(-1.5, 1.5, n_pts)
    direction = np.array([np.cos(0.4), np.sin(0.4)])
    gt_xy = t[:, None] * direction[None, :]  # rotated line in x/y
    marker_raw = _gt_marker_raw(gt_xy)

    markers = []
    bundles = []
    off = np.zeros(n_pts)
    off[1:-1] = bend * np.array([1.0, -1.0, 1.0])[: n_pts - 2]
    for i in range(n_pts):
        # Bent start: offset perpendicular to the line.
        perp = np.array([-direction[1], direction[0]])
        start = gt_xy[i] + off[i] * perp
        bnd = sg.create_bundle(
            "b%d" % i, tx=float(start[0]), ty=float(start[1]), tz=0.0
        )
        mkr = sg.create_marker(
            "m%d" % i, camera=cam, bundle=bnd,
            tx=float(marker_raw[i, 0]), ty=float(marker_raw[i, 1]),
        )
        markers.append(mkr)
        bundles.append(bnd)
    return sg, cam, markers, bundles, gt_xy, direction


def _collinearity_residual(xy):
    """Max perpendicular deviation of points from their TLS line."""
    mean = xy.mean(axis=0)
    d = xy - mean
    _, _, vt = np.linalg.svd(d, full_matrices=False)
    normal = vt[-1]
    return np.abs(d @ normal).max()


def test_line_constraint_recovers_straight_line():
    sg, cam, markers, bundles, gt_xy, direction = _line_scene()
    line = sg.create_line("edge", markers, weight=1.0)
    scene, attrs = sg.bake()

    start_xy = np.stack([
        [float(np.asarray(attrs.static_values)[b.attr("tx").code // 2]),
         float(np.asarray(attrs.static_values)[b.attr("ty").code // 2])]
        for b in bundles
    ])
    assert _collinearity_residual(start_xy) > 0.3  # visibly bent

    # Only the line residual drives the solve: markers are masked out,
    # middle bundles' y is free (3 parameters vs 5 line errors — a line
    # constraint alone cannot pin all 6 DOF, sliding along the line is
    # a gauge freedom).
    solve_attrs = [b.attr("ty") for b in bundles[1:-1]]
    mask = np.zeros((len(markers), 1), bool)
    attrs_out, result = solve(
        scene, attrs, [0], solve_attrs,
        SolverOptions(iterations=50, accept_only_better=False),
        marker_frame_mask=mask,
        lines=sg.line_spec([line]),
    )
    assert result.success, result.reason_string
    solved_xy = np.stack([
        [float(np.asarray(attrs_out.static_values)[
            b.attr("tx").code // 2]),
         float(np.asarray(attrs_out.static_values)[
             b.attr("ty").code // 2])]
        for b in bundles
    ])
    # Bundles are now collinear (in world x/y, which maps linearly to
    # screen space for this fronto-parallel plane).
    assert _collinearity_residual(solved_xy) < 1e-4


def test_line_plus_markers_through_collection():
    """Markers + a line constraint through the Collection API: the
    solve is driven by markers, the line acts as regularization."""
    sg, cam, markers, bundles, gt_xy, _ = _line_scene(bend=0.3)
    line = sg.create_line("edge", markers, weight=0.5)

    col = mmapi.Collection(sg)
    col.add_marker(*markers)
    col.add_line(line)
    for b in bundles[1:-1]:
        col.add_attribute(b.attr("tx"), b.attr("ty"))
    col.set_solver(mmapi.SolverStep(frame_indices=[0]))
    attrs_out, results = mmapi.execute(col)
    assert results[0].success
    solved_xy = np.stack([
        [float(np.asarray(attrs_out.static_values)[
            b.attr("tx").code // 2]),
         float(np.asarray(attrs_out.static_values)[
             b.attr("ty").code // 2])]
        for b in bundles
    ])
    # Markers observe the true straight line -> bundles recover it.
    np.testing.assert_allclose(solved_xy, gt_xy, atol=1e-3)


def test_line_spec_padding():
    sg, cam, markers, bundles, _, _ = _line_scene()
    l1 = sg.create_line("l1", markers[:3])
    l2 = sg.create_line("l2", markers, weight=2.0)
    spec = sg.line_spec()
    assert spec["mkr_index"].shape == (2, 5)
    assert spec["mkr_mask"][0].sum() == 3
    assert spec["mkr_mask"][1].sum() == 5
    assert spec["weight"][1] == 2.0
    del l1, l2
