"""Lens distortion inside the solve loop (BASELINE config #4):
markers synthesized through a 3DE classic lens; solving recovers bundle
positions and the lens distortion parameter."""

import numpy as np
import jax.numpy as jnp

from mayamatchmovesolver_tpu.core.constants import FilmFit
from mayamatchmovesolver_tpu.models import scenelens
from mayamatchmovesolver_tpu.scene import SceneGraph
from mayamatchmovesolver_tpu.solver import (
    SolverOptions,
    build_problem,
    measure_residuals,
    solve,
)


def _make_scene(distortion, bundle_offsets):
    sg = SceneGraph(frame_range=(1, 1))
    cam = sg.create_camera(
        "cam", tz=10.0, focal_length_mm=35.0,
        sensor_width_mm=36.0, sensor_height_mm=24.0,
        film_fit=FilmFit.HORIZONTAL, render_width=1500, render_height=1000,
    )
    lens_attrs = scenelens.attach_lens(
        sg, cam, scenelens.LENS_MODEL_CLASSIC, distortion=distortion
    )
    rng = np.random.RandomState(4)
    bundles = []
    for i in range(6):
        off = bundle_offsets[i] if bundle_offsets is not None else (0, 0)
        bundles.append(
            sg.create_bundle(
                "b%d" % i,
                tx=rng.uniform(-3, 3) + off[0],
                ty=rng.uniform(-2, 2) + off[1],
                tz=rng.uniform(-8, -4),
            )
        )
    markers = [
        sg.create_marker("m%d" % i, camera=cam, bundle=b)
        for i, b in enumerate(bundles)
    ]
    return sg, cam, bundles, markers, lens_attrs


def _synthesize_markers(sg, markers, lens):
    """Bake marker positions = lens-distorted projections of bundles."""
    scene, attrs = sg.bake()
    options = SolverOptions(image_width=1500.0)
    prob = build_problem(scene, attrs, [0], [], options, lens=lens)
    import mayamatchmovesolver_tpu.scene.flatscene as fs
    from mayamatchmovesolver_tpu.models.scenelens import apply_scene_lens

    ev = fs.evaluate(scene, attrs, jnp.asarray([0]))
    pts = apply_scene_lens(
        lens, scene, attrs, jnp.asarray([0]), ev.point_xy,
        scene.mkr_cam_index,
    )
    static = np.array(attrs.static_values)
    for i, mkr in enumerate(markers):
        static[mkr.attr("tx").code // 2] = float(pts[i, 0, 0])
        static[mkr.attr("ty").code // 2] = float(pts[i, 0, 1])
    return scene, attrs._replace(static_values=jnp.asarray(static))


def test_lens_distortion_zero_residual_at_truth():
    sg, cam, bundles, markers, _ = _make_scene(0.2, None)
    lens = scenelens.bake_scene_lens(sg)
    scene, attrs = _synthesize_markers(sg, markers, lens)
    options = SolverOptions(image_width=1500.0)
    prob = build_problem(scene, attrs, [0], [], options, lens=lens)
    residuals, aux = measure_residuals(prob, attrs)
    assert float(aux["error_avg"]) < 1e-6


def test_solve_bundles_through_lens():
    offsets = [(0.3, -0.2)] * 6
    sg, cam, bundles, markers, _ = _make_scene(0.2, None)
    lens = scenelens.bake_scene_lens(sg)
    scene, attrs = _synthesize_markers(sg, markers, lens)

    # Perturb bundle x/y, then solve them back through the lens.
    static = np.array(attrs.static_values)
    solve_attrs = []
    for i, b in enumerate(bundles):
        static[b.attr("tx").code // 2] += offsets[i][0]
        static[b.attr("ty").code // 2] += offsets[i][1]
        solve_attrs += [b.attr("tx"), b.attr("ty")]
    attrs = attrs._replace(static_values=jnp.asarray(static))

    options = SolverOptions(iterations=50, image_width=1500.0)
    new_attrs, result = solve(
        scene, attrs, [0], solve_attrs, options, lens=lens
    )
    assert result.success
    assert result.error_final < 1e-4, result.error_final


def test_solve_lens_distortion_parameter():
    sg, cam, bundles, markers, lens_attrs = _make_scene(0.15, None)
    lens = scenelens.bake_scene_lens(sg)
    scene, attrs = _synthesize_markers(sg, markers, lens)

    # Reset distortion to zero and solve it back.
    static = np.array(attrs.static_values)
    k_attr = lens_attrs["distortion"]
    static[k_attr.code // 2] = 0.0
    attrs = attrs._replace(static_values=jnp.asarray(static))

    options = SolverOptions(iterations=80, image_width=1500.0)
    new_attrs, result = solve(
        scene, attrs, [0], [k_attr], options, lens=lens
    )
    assert result.success
    solved_k = float(new_attrs.static_values[k_attr.code // 2])
    np.testing.assert_allclose(solved_k, 0.15, atol=1e-4)
