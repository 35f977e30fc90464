"""Relationship analysis tests (host-side, no XLA).

(ref behavior: adjust_relationships.cpp:369-565, tests exercising
mmSolverAffects in tests/test/test_solver.)"""

import numpy as np

from mayamatchmovesolver_tpu.scene import SceneGraph
from mayamatchmovesolver_tpu.solver import affects


def _two_camera_scene():
    sg = SceneGraph(frame_range=(1, 2))
    rig = sg.create_transform("rig", tx=1.0)
    cam_a = sg.create_camera("camA", parent=rig)
    cam_b = sg.create_camera("camB")
    bnd_a = sg.create_bundle("bndA", tx=1.0)
    bnd_b = sg.create_bundle("bndB", tx=-1.0)
    mkr_a = sg.create_marker("mkrA", camera=cam_a, bundle=bnd_a)
    mkr_b = sg.create_marker("mkrB", camera=cam_b, bundle=bnd_b)
    return sg, rig, cam_a, cam_b, bnd_a, bnd_b, mkr_a, mkr_b


def test_marker_attr_affects_matrix():
    sg, rig, cam_a, cam_b, bnd_a, bnd_b, mkr_a, mkr_b = (
        _two_camera_scene()
    )
    attrs = [
        bnd_a.attr("tx"),      # affects mkrA only
        bnd_b.attr("ty"),      # affects mkrB only
        cam_a.attr("rx"),      # affects mkrA only
        rig.attr("tx"),        # camA's parent -> affects mkrA only
        cam_b.attr("focal_length_mm"),  # affects mkrB only
    ]
    m = affects.marker_attr_affects([mkr_a, mkr_b], attrs)
    expected = np.array(
        [
            [True, False, True, True, False],
            [False, True, False, False, True],
        ]
    )
    np.testing.assert_array_equal(m, expected)


def test_split_used():
    sg, rig, cam_a, cam_b, bnd_a, bnd_b, mkr_a, mkr_b = (
        _two_camera_scene()
    )
    # Only bndA attrs: markerB and camB attr are unused.
    attrs = [bnd_a.attr("tx"), cam_b.attr("focal_length_mm")]
    used_m, unused_m, used_a, unused_a = (
        affects.split_used_markers_and_attributes([mkr_a], attrs)
    )
    assert used_m == [mkr_a]
    assert used_a == [bnd_a.attr("tx")]
    assert unused_a == [cam_b.attr("focal_length_mm")]


def test_error_to_parameter_expansion():
    sg = SceneGraph(frame_range=(1, 3))
    cam = sg.create_camera(
        "cam", tx=np.zeros(3)
    )
    bnd = sg.create_bundle("bnd")
    mkr = sg.create_marker("mkr", camera=cam, bundle=bnd)
    attrs = [cam.attr("tx"), bnd.attr("ty")]  # animated + static
    m = affects.error_to_parameter_matrix([mkr], attrs, num_frames=3)
    # 1 marker * 3 frames * 2 errors = 6 rows; params: 3 (anim) + 1.
    assert m.shape == (6, 4)
    # Animated cam.tx frame 1 only affects frame-1 errors (rows 2,3).
    np.testing.assert_array_equal(m[:, 1], [0, 0, 1, 1, 0, 0])
    # Static bundle ty affects all errors.
    assert m[:, 3].all()


def test_summary_string():
    sg, rig, cam_a, cam_b, bnd_a, bnd_b, mkr_a, mkr_b = (
        _two_camera_scene()
    )
    text = affects.affects_summary_string(
        [mkr_a], [bnd_a.attr("tx"), bnd_b.attr("tx")]
    )
    assert "mkrA: bndA.tx" in text


def test_error_to_parameter_mask_matches_jacfwd():
    """The affects mask IS the analytic Jacobian's structural sparsity:
    on a two-camera scene, jacfwd's marker-error rows must be zero
    everywhere the mask is False (round-3 verdict #10; ref: the
    errorToParamList bitmap gating Jacobian work,
    adjust_solveFunc.cpp:187-226)."""
    import importlib

    import jax
    import jax.numpy as jnp

    from mayamatchmovesolver_tpu.scene import evaluate
    from mayamatchmovesolver_tpu.scene.flatscene import (
        set_marker_screen_positions,
    )
    from mayamatchmovesolver_tpu.solver import SolverOptions
    from mayamatchmovesolver_tpu.solver import problem as problem_mod

    solve_mod = importlib.import_module(
        "mayamatchmovesolver_tpu.solver.solve"
    )

    sg = SceneGraph(frame_range=(1, 3))
    cam_a = sg.create_camera("camA", tz=10.0, tx=np.zeros(3))
    cam_b = sg.create_camera("camB", tz=8.0, tx=2.0 + np.zeros(3))
    bnd_a = sg.create_bundle("bndA", tx=0.5, ty=0.2, tz=-5.0)
    bnd_b = sg.create_bundle("bndB", tx=1.5, ty=-0.3, tz=-4.0)
    mkr_a = sg.create_marker("mkrA", camera=cam_a, bundle=bnd_a,
                             tx=np.zeros(3), ty=np.zeros(3))
    mkr_b = sg.create_marker("mkrB", camera=cam_b, bundle=bnd_b,
                             tx=np.zeros(3), ty=np.zeros(3))
    scene, attr_block = sg.bake()
    fi = jnp.arange(3)
    ev = evaluate(scene, attr_block, fi)
    attr_block = set_marker_screen_positions(scene, attr_block, fi,
                                             ev.point_xy)

    solve_attrs = [
        bnd_a.attr("tx"),            # static, affects mkrA only
        bnd_b.attr("ty"),            # static, affects mkrB only
        cam_a.attr("tx"),            # animated, affects mkrA only
        cam_b.attr("focal_length_mm"),  # static, affects mkrB only
    ]
    options = SolverOptions(image_width=1920.0)
    problem = solve_mod.build_problem(
        scene, attr_block, np.arange(3), solve_attrs, options
    )
    fn = problem_mod.residual_fn(problem)
    x0 = problem_mod.initial_parameters(problem)
    j = np.asarray(jax.jacfwd(fn)(x0))

    mask = affects.error_to_parameter_matrix(
        [mkr_a, mkr_b], solve_attrs, num_frames=3,
    )
    n_marker_rows = 2 * 3 * 2  # markers * frames * xy
    j_mkr = j[:n_marker_rows]
    assert mask.shape == j_mkr.shape
    # Structural zeros are actual zeros.
    assert np.all(np.abs(j_mkr[~mask]) == 0.0)
    # And the mask is tight: every column marked True has real
    # derivative mass somewhere.
    for col in range(mask.shape[1]):
        assert np.any(np.abs(j_mkr[:, col][mask[:, col]]) > 0.0), col


def test_execute_drops_unused_attributes():
    """api.execute excludes attrs that affect no collection marker
    (the reference's used/unused split, adjust_base.cpp:574) instead of
    solving a singular system."""
    import jax.numpy as jnp

    import mayamatchmovesolver_tpu.api as mmapi
    from mayamatchmovesolver_tpu.scene import evaluate
    from mayamatchmovesolver_tpu.scene.flatscene import (
        set_marker_screen_positions,
    )

    sg = SceneGraph(frame_range=(1, 4))
    cam = sg.create_camera("cam", tz=10.0, render_width=1920,
                           render_height=1080)
    bnd = sg.create_bundle("bnd", tx=0.4, ty=0.2, tz=-5.0)
    mkr = sg.create_marker("mkr", camera=cam, bundle=bnd,
                           tx=np.zeros(4), ty=np.zeros(4))
    # An unrelated transform: not an ancestor of anything measured.
    floater = sg.create_transform("floater", tx=3.0)
    scene, attrs = sg.bake()
    fi = jnp.arange(4)
    ev = evaluate(scene, attrs, fi)
    attrs = set_marker_screen_positions(scene, attrs, fi, ev.point_xy)
    # Perturb the bundle so there is something to solve.
    static = np.array(attrs.static_values)
    static[bnd.attr("tx").code // 2] += 0.2
    # Write back into the scene graph so execute()'s bake sees it.
    sg.set_value(bnd.attr("tx"), float(static[bnd.attr("tx").code // 2]))

    col = mmapi.Collection(sg)
    col.add_marker(mkr)
    col.add_attribute(bnd.attr("tx"), bnd.attr("ty"),
                      floater.attr("tx"))  # floater is unused
    col.set_solver(mmapi.SolverStep(frame_indices=range(4)))
    col.options = mmapi.SolverOptions(image_width=1920.0)
    # Rebuild markers from the baked attrs (the scene graph holds the
    # original marker values; rewrite them so bake() reproduces attrs).
    anim = np.asarray(attrs.anim_values)
    for ch in ("tx", "ty"):
        a = mkr.attr(ch)
        for f in range(4):
            sg.set_value(a, float(anim[a.code // 2, f]), frame=f)

    new_attrs, results = mmapi.execute(col)
    assert results[0].success, results[0].reason_string
    # The floater attribute was not solved (value unchanged).
    ns = np.asarray(new_attrs.static_values)
    assert ns[floater.attr("tx").code // 2] == 3.0
    # The bundle was recovered.
    np.testing.assert_allclose(
        ns[bnd.attr("tx").code // 2], 0.4, atol=1e-4
    )


def test_execute_skips_locked_attributes():
    """Locked attributes are excluded from the solve (ref: the
    reference's Attribute.is_locked + compile-layer filtering,
    _api/attribute.py:237)."""
    import jax.numpy as jnp

    import mayamatchmovesolver_tpu.api as mmapi
    from mayamatchmovesolver_tpu.scene import evaluate
    from mayamatchmovesolver_tpu.scene.flatscene import (
        set_marker_screen_positions,
    )

    sg = SceneGraph(frame_range=(1, 4))
    cam = sg.create_camera("cam", tz=10.0, render_width=1920,
                           render_height=1080)
    bnd = sg.create_bundle("bnd", tx=0.4, ty=0.2, tz=-5.0)
    mkr = sg.create_marker("mkr", camera=cam, bundle=bnd,
                           tx=np.zeros(4), ty=np.zeros(4))
    scene, attrs = sg.bake()
    fi = jnp.arange(4)
    ev = evaluate(scene, attrs, fi)
    attrs = set_marker_screen_positions(scene, attrs, fi, ev.point_xy)
    anim = np.asarray(attrs.anim_values)
    for ch in ("tx", "ty"):
        a = mkr.attr(ch)
        for f in range(4):
            sg.set_value(a, float(anim[a.code // 2, f]), frame=f)
    # Perturb BOTH bundle channels; lock ty.
    sg.set_value(bnd.attr("tx"), 0.6)
    sg.set_value(bnd.attr("ty"), 0.5)
    bnd.attr("ty").lock()

    col = mmapi.Collection(sg)
    col.add_marker(mkr)
    col.add_attribute(bnd.attr("tx"), bnd.attr("ty"))
    col.set_solver(mmapi.SolverStep(frame_indices=range(4)))
    col.options = mmapi.SolverOptions(image_width=1920.0,
                                      accept_only_better=False)
    new_attrs, results = mmapi.execute(col)
    assert results[0].success, results[0].reason_string
    ns = np.asarray(new_attrs.static_values)
    # tx solved toward truth; ty held at its (locked) perturbed value.
    assert abs(ns[bnd.attr("tx").code // 2] - 0.4) < 0.1
    assert ns[bnd.attr("ty").code // 2] == 0.5

    # All-locked collections fail cleanly.
    bnd.attr("tx").lock()
    _, results = mmapi.execute(col)
    assert not results[0].success
    assert "locked" in results[0].reason_string
