""".mmcamera camera file round-trip tests
(ref: python/mmSolver/tools/copypastecamera + test_tools)."""

import json

import numpy as np

from mayamatchmovesolver_tpu.io import camerafile
from mayamatchmovesolver_tpu.scene import SceneGraph


def _scene(n=5):
    sg = SceneGraph(frame_range=(1, n))
    cam = sg.create_camera(
        "shotCam",
        tx=np.linspace(0, 4, n),
        ty=1.5,
        tz=10.0,
        ry=np.linspace(-10, 10, n),
        focal_length_mm=50.0,
        render_width=2048,
        render_height=1152,
    )
    bnd = sg.create_bundle("b", tz=-5.0)
    sg.create_marker("m", camera=cam, bundle=bnd)
    return sg, cam


def test_write_read_roundtrip(tmp_path):
    sg, cam = _scene()
    _, attrs = sg.bake()
    path = str(tmp_path / ("cam" + camerafile.EXT))
    camerafile.write_camera(
        path, cam, attrs, sg.frame_range,
        image={"file_path": "/plates/sh010.####.exr", "width": 2048,
               "height": 1152, "pixel_aspect_ratio": 1.0},
    )

    with open(path) as f:
        payload = json.load(f)
    assert payload["version"] == 1
    assert payload["data"]["name"] == "shotCam"
    assert payload["data"]["start_frame"] == 1
    assert payload["data"]["attr"]["translateX"][0] == [1, 0.0]
    # Film back is stored in millimetres (Maya default 36x24mm).
    assert payload["data"]["attr"]["filmBackWidth"][0][1] == 36.0

    data = camerafile.read_camera(path)
    assert data.frame_range == (1, 5)
    np.testing.assert_allclose(data.channels["tx"], np.linspace(0, 4, 5))
    np.testing.assert_allclose(data.channels["ty"], 1.5)
    np.testing.assert_allclose(data.channels["focal_length_mm"], 50.0)
    assert data.image["width"] == 2048


def test_create_camera_from_file(tmp_path):
    sg, cam = _scene()
    _, attrs = sg.bake()
    path = str(tmp_path / ("cam" + camerafile.EXT))
    camerafile.write_camera(
        path, cam, attrs, sg.frame_range,
        image={"width": 2048, "height": 1152},
    )

    sg2 = SceneGraph(frame_range=(1, 5))
    cam2 = camerafile.create_camera_from_file(sg2, path)
    assert cam2.name == "shotCam"
    assert cam2.render_width == 2048
    b = sg2.create_bundle("b", tz=-5.0)
    sg2.create_marker("m", camera=cam2, bundle=b)
    scene2, attrs2 = sg2.bake()

    # The pasted camera evaluates to the same world matrices.
    import jax.numpy as jnp

    from mayamatchmovesolver_tpu.scene import evaluate

    scene1, attrs1 = sg.bake()
    ev1 = evaluate(scene1, attrs1, jnp.arange(5))
    ev2 = evaluate(scene2, attrs2, jnp.arange(5))
    np.testing.assert_allclose(
        np.asarray(ev1.cam_world), np.asarray(ev2.cam_world), atol=1e-12
    )
