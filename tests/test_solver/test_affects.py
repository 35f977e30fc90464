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
