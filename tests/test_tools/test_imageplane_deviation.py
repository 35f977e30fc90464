"""Image-plane data rig + deviation-curve export tools."""

import json
import os

import numpy as np
import jax.numpy as jnp

from mayamatchmovesolver_tpu.core.constants import FilmFit
from mayamatchmovesolver_tpu.scene import SceneGraph, evaluate
from mayamatchmovesolver_tpu.scene.flatscene import (
    set_marker_screen_positions,
)
from mayamatchmovesolver_tpu.solver import SolverOptions, solve
from mayamatchmovesolver_tpu.tools import deviation, imageplane


def test_image_plane_size_similar_triangles():
    # 36mm back at focal 36mm -> plane width == depth.
    s = imageplane.image_plane_size(36.0, 36.0, 24.0, depth=7.0)
    np.testing.assert_allclose(s["width"], 7.0)
    np.testing.assert_allclose(s["height"], 7.0 * 24.0 / 36.0)
    # Film offset shifts the center by the same scale.
    s = imageplane.image_plane_size(36.0, 36.0, 24.0, depth=7.0,
                                    film_offset_x_mm=1.8)
    np.testing.assert_allclose(s["center_x"], 0.35)


def test_image_plane_corners_project_to_screen_corners():
    """The plane corners must land exactly on the camera frustum
    corners: reprojected, they are screen (+-0.5 * fit) extremes."""
    from mayamatchmovesolver_tpu.core import camera as cam_mod

    focal, fbw, fbh, depth = 35.0, 36.0, 24.0, 10.0
    corners, uvs = imageplane.image_plane_corners(focal, fbw, fbh, depth)
    assert corners.shape == (4, 3) and uvs.shape == (4, 2)
    # Project through the camera projection matrix (render aspect ==
    # film aspect, horizontal fit -> x in [-0.5, 0.5]).
    proj = np.asarray(cam_mod.projection_matrix(
        jnp.asarray(focal),
        jnp.asarray(fbw / 25.4), jnp.asarray(fbh / 25.4),
        jnp.asarray(0.0), jnp.asarray(0.0),
        1500.0, 1000.0,  # render aspect == film aspect (36/24)
        int(FilmFit.HORIZONTAL),
        0.1, 10000.0, 1.0,
    ))
    hom = np.concatenate([corners, np.ones((4, 1))], axis=1) @ proj.T
    ndc = hom[:, :2] / hom[:, 3:4]
    # projection_matrix maps the film gate to [-1, 1] clip space (the
    # engine halves to marker space later); corners hit the extremes.
    np.testing.assert_allclose(
        sorted(ndc[:, 0]), [-1.0, -1.0, 1.0, 1.0], atol=1e-9
    )
    np.testing.assert_allclose(
        sorted(ndc[:, 1]), [-1.0, -1.0, 1.0, 1.0], atol=1e-9
    )


def test_create_image_plane_in_scene_graph(tmp_path):
    from mayamatchmovesolver_tpu.io import exr

    img_path = str(tmp_path / "plate.exr")
    exr.write_pixels(img_path, np.zeros((12, 34, 3), np.float32))

    sg = SceneGraph(frame_range=(1, 4))
    cam = sg.create_camera("cam", tz=5.0, focal_length_mm=50.0,
                           sensor_width_mm=36.0, sensor_height_mm=24.0,
                           render_width=1920, render_height=1080)
    node, info = imageplane.create_image_plane(
        sg, cam, depth=8.0, image_path=img_path
    )
    assert node.parent is cam
    np.testing.assert_allclose(sg.get_value(node.attr("tz")), -8.0)
    np.testing.assert_allclose(info["width"], 36.0 * 8.0 / 50.0)
    assert info["image_width"] == 34 and info["image_height"] == 12
    # The engine needs at least one marker/bundle to bake.
    bnd = sg.create_bundle("b", tz=-5.0)
    sg.create_marker("m", camera=cam, bundle=bnd)
    # The plane node evaluates inside the engine at the camera-relative
    # position.
    scene, attrs = sg.bake()
    ev = evaluate(scene, attrs, jnp.arange(4))
    world = np.asarray(ev.tfm_world)[node.index]
    np.testing.assert_allclose(world[0, :3, 3], [0.0, 0.0, -3.0],
                               atol=1e-12)


def test_image_sequence_paths(tmp_path):
    frames = [1, 2, 10]
    paths = imageplane.image_sequence_paths("plate.####.exr", frames)
    assert paths == ["plate.0001.exr", "plate.0002.exr",
                     "plate.0010.exr"]


def test_fit_to_render_resolution():
    s = {"width": 10.0, "height": 10.0, "center_x": 0, "center_y": 0}
    out = imageplane.fit_to_render_resolution(s, 2000, 1000,
                                              FilmFit.HORIZONTAL)
    np.testing.assert_allclose(out["height"], 5.0)
    out = imageplane.fit_to_render_resolution(s, 2000, 1000,
                                              FilmFit.VERTICAL)
    np.testing.assert_allclose(out["width"], 20.0)


def _solved_result():
    rng = np.random.RandomState(0)
    sg = SceneGraph(frame_range=(1, 6))
    cam = sg.create_camera("cam", tz=10.0, render_width=1920,
                           render_height=1080,
                           film_fit=FilmFit.HORIZONTAL)
    bundles = [
        sg.create_bundle("b%d" % i, tx=rng.uniform(-2, 2),
                         ty=rng.uniform(-1, 1), tz=rng.uniform(-6, -3))
        for i in range(4)
    ]
    for i, b in enumerate(bundles):
        sg.create_marker("m%d" % i, camera=cam, bundle=b)
    scene, attrs = sg.bake()
    ev = evaluate(scene, attrs, jnp.arange(6))
    attrs = set_marker_screen_positions(scene, attrs, jnp.arange(6),
                                        ev.point_xy)
    static = np.array(attrs.static_values)
    solve_attrs = []
    for b in bundles[:2]:
        a = b.attr("tx")
        static[a.code // 2] += 0.2
        solve_attrs.append(a)
    attrs = attrs._replace(static_values=jnp.asarray(static))
    _, result = solve(scene, attrs, list(range(6)), solve_attrs,
                      SolverOptions(image_width=1920.0,
                                    accept_only_better=False))
    return result


def test_deviation_stats_and_exports(tmp_path):
    result = _solved_result()
    stats = deviation.deviation_stats(result)
    assert set(stats) == {"marker_%d" % i for i in range(4)}
    for s in stats.values():
        assert np.isfinite(s["average"])
        # ULP slack: mean of near-identical errors can exceed max by
        # one rounding step.
        assert s["maximum"] >= s["average"] * (1 - 1e-12)
        assert s["average"] >= 0.0
        assert s["worst_frame"] in result.per_frame_error.frames

    worst = deviation.worst_markers(result, count=2)
    assert len(worst) == 2
    avgs = {n: stats[n]["average"] for n in stats}
    assert avgs[worst[0]] == max(avgs.values())

    jpath = str(tmp_path / "dev.json")
    out = deviation.write_deviation_json(jpath, result)
    with open(jpath) as f:
        loaded = json.load(f)
    assert loaded["per_frame"]["frames"] == list(
        result.per_frame_error.frames
    )
    assert loaded["stats"].keys() == out["stats"].keys()

    cpath = str(tmp_path / "dev.csv")
    frames, names = deviation.write_deviation_csv(cpath, result)
    assert os.path.getsize(cpath) > 0
    with open(cpath) as f:
        header = f.readline().strip().split(",")
    assert header[:2] == ["frame", "solve_error"]
    assert header[2:] == sorted(names)
