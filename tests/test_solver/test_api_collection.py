"""Collection/execute API tests: marker-set restriction + lens wiring
(ref: _api/collection.py membership semantics, _execute/main.py)."""

import numpy as np

import mayamatchmovesolver_tpu.api as mmapi
from mayamatchmovesolver_tpu.scene import evaluate
from mayamatchmovesolver_tpu.scene.flatscene import (
    set_marker_screen_positions,
)


def test_collection_marker_mask_restricts_solve():
    import jax.numpy as jnp

    n = 4
    sg = mmapi.SceneGraph(frame_range=(1, n))
    cam = sg.create_camera("cam", tx=np.linspace(-1, 1, n), tz=10.0)
    bnd1 = sg.create_bundle("b1", tx=0.8, ty=0.2, tz=-5.0)
    mkr1 = sg.create_marker("m1", camera=cam, bundle=bnd1,
                            tx=np.zeros(n), ty=np.zeros(n))
    bnd2 = sg.create_bundle("b2", tx=-0.5, ty=0.1, tz=-6.0)
    mkr2 = sg.create_marker("m2", camera=cam, bundle=bnd2,
                            tx=np.zeros(n), ty=np.zeros(n))
    scene, attrs = sg.bake()
    ev = evaluate(scene, attrs, jnp.arange(n))
    attrs = set_marker_screen_positions(scene, attrs, jnp.arange(n),
                                        ev.point_xy)
    # Poison marker m2's track so including it would corrupt the solve.
    anim = np.array(attrs.anim_values)
    anim[mkr2.attr("tx").code // 2] += 0.2
    attrs = attrs._replace(anim_values=jnp.asarray(anim))
    # Write attrs back into the scene graph's builder state by solving
    # from these attrs directly through the strategy layer.
    from mayamatchmovesolver_tpu.solver import SolverOptions
    from mayamatchmovesolver_tpu.solver.strategies import SolverStep

    # Perturb bundle 1.
    static = np.array(attrs.static_values)
    static[bnd1.attr("tx").code // 2] += 0.3
    attrs = attrs._replace(static_values=jnp.asarray(static))

    solver = SolverStep(frame_indices=list(range(n)))
    mask = np.array([True, False])
    new_attrs, results = solver.execute(
        scene, attrs, [bnd1.attr("tx"), bnd1.attr("ty")],
        SolverOptions(image_width=1920.0), marker_mask=mask,
    )
    assert results[0].success
    tx = float(new_attrs.static_values[bnd1.attr("tx").code // 2])
    assert abs(tx - 0.8) < 1e-5, tx

    # Without the mask the poisoned marker is measured too: error stays.
    _, results_all = solver.execute(
        scene, attrs, [bnd1.attr("tx"), bnd1.attr("ty")],
        SolverOptions(image_width=1920.0),
    )
    assert results_all[0].error_final > results[0].error_final


def test_execute_validation_failures():
    sg = mmapi.SceneGraph(frame_range=(1, 2))
    cam = sg.create_camera("cam", tz=10.0)
    bnd = sg.create_bundle("b", tz=-5.0)
    mkr = sg.create_marker("m", camera=cam, bundle=bnd)
    col = mmapi.Collection(sg)
    _, results = mmapi.execute(col)
    assert not results[0].success
    assert "no markers" in results[0].reason_string
    col.add_marker(mkr)
    col.add_attribute(bnd.attr("tx"))
    _, results = mmapi.execute(col)
    assert "no solver" in results[0].reason_string


def test_execute_stores_results_on_collection():
    """v2 results-node semantics: execute() persists its results on the
    Collection (ref: MMSolver2Cmd.cpp:103-148 writes typed results onto
    the Collection node; _execute/main.py:128-155)."""
    import jax.numpy as jnp

    from mayamatchmovesolver_tpu.solver import SolverOptions
    from mayamatchmovesolver_tpu.solver.strategies import SolverStep

    sg = mmapi.SceneGraph(frame_range=(1, 4))
    cam = sg.create_camera("cam", tz=10.0, render_width=1920,
                           render_height=1080)
    bnd = sg.create_bundle("b", tx=1.0, tz=-5.0)
    mkr = sg.create_marker("m", camera=cam, bundle=bnd)
    scene, attrs = sg.bake()
    ev = evaluate(scene, attrs, jnp.arange(4))
    # Track the true bundle, then perturb it in the editable graph.
    point = np.asarray(ev.point_xy)[0, 0]
    sg.set_value(mkr.attr("tx"), float(point[0]))
    sg.set_value(mkr.attr("ty"), float(point[1]))
    sg.set_value(bnd.attr("tx"), 1.25)

    col = mmapi.Collection(sg)
    col.add_marker(mkr)
    col.add_attribute(bnd.attr("tx"))
    col.solver = SolverStep(frame_indices=list(range(4)))
    col.options = SolverOptions(image_width=1920.0)
    assert col.last_results == []
    new_attrs, results = mmapi.execute(col)
    assert col.last_results is results
    assert results and results[0].success
    tx = float(np.asarray(new_attrs.static_values)[
        bnd.attr("tx").code // 2])
    assert abs(tx - 1.0) < 1e-4
