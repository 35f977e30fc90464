"""Tests for the small host-side utils: raytrace, animcurve, time,
event, sort, converttypes, imageseq (ref: tests/test/test_utils/)."""

import os

import numpy as np
import pytest


# ---- raytrace ------------------------------------------------------------


def _unit_quad():
    # Quad in the z=0 plane from (-1,-1) to (1,1), two triangles.
    vertices = np.array(
        [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], dtype=float
    )
    triangles = np.array([[0, 1, 2], [0, 2, 3]], dtype=np.int32)
    return vertices, triangles


def test_raytrace_hit_and_miss():
    from mayamatchmovesolver_tpu.utils import raytrace

    v, t = _unit_quad()
    hit = raytrace.closest_intersect([0.25, 0.25, 5.0], [0, 0, -1], v, t)
    np.testing.assert_allclose(np.asarray(hit), [0.25, 0.25, 0.0],
                               atol=1e-6)
    miss = raytrace.closest_intersect([5.0, 5.0, 5.0], [0, 0, -1], v, t)
    assert miss is None
    # Pointing away: miss unless test_both_directions.
    away = raytrace.closest_intersect([0.0, 0.0, 5.0], [0, 0, 1], v, t)
    assert away is None
    both = raytrace.closest_intersect(
        [0.0, 0.0, 5.0], [0, 0, 1], v, t, test_both_directions=True
    )
    np.testing.assert_allclose(np.asarray(both), [0, 0, 0], atol=1e-6)


def test_raytrace_normal_and_batch():
    from mayamatchmovesolver_tpu.utils import raytrace

    v, t = _unit_quad()
    hit, normal = raytrace.closest_intersect_with_normal(
        [0.0, 0.0, 2.0], [0, 0, -1], v, t
    )
    np.testing.assert_allclose(np.abs(np.asarray(normal)), [0, 0, 1],
                               atol=1e-6)
    origins = np.array([[0, 0, 3.0], [0.5, 0.5, 3.0], [9, 9, 3.0]])
    dirs = np.tile([0.0, 0.0, -1.0], (3, 1))
    pts, _, dist, ok = raytrace.intersect_rays_mesh(origins, dirs, v, t)
    assert list(np.asarray(ok)) == [True, True, False]
    np.testing.assert_allclose(np.asarray(dist)[:2], [3.0, 3.0],
                               atol=1e-6)
    # Closest of multiple surfaces wins.
    v2 = np.concatenate([v, v + [0, 0, 1.0]])
    t2 = np.concatenate([t, t + 4]).astype(np.int32)
    pts, _, dist, ok = raytrace.intersect_rays_mesh(
        origins[:1], dirs[:1], v2, t2
    )
    np.testing.assert_allclose(float(dist[0]), 2.0, atol=1e-6)


# ---- animcurve -----------------------------------------------------------


def test_animcurve_sample_and_euler_filter():
    from mayamatchmovesolver_tpu.utils import animcurve

    c = animcurve.create_anim_curve([1, 5, 10], [0.0, 4.0, -1.0])
    np.testing.assert_allclose(c.sample([1, 3, 5, 10, 20]),
                               [0.0, 2.0, 4.0, -1.0, -1.0])
    dense = c.to_dense((1, 5))
    assert dense.shape == (5,)
    np.testing.assert_allclose(dense, [0, 1, 2, 3, 4.0])

    assert animcurve.euler_filter_value(170.0, -170.0) == 190.0
    assert animcurve.euler_filter_value(-170.0, 170.0) == -190.0
    assert animcurve.euler_filter_value(10.0, 20.0) == 20.0
    filtered = animcurve.euler_filter_array([170.0, -170.0, -150.0])
    np.testing.assert_allclose(filtered, [170.0, 190.0, 210.0])


# ---- time ----------------------------------------------------------------


def test_time_frame_ranges():
    from mayamatchmovesolver_tpu.scene import SceneGraph
    from mayamatchmovesolver_tpu.utils import time as time_utils

    fr = time_utils.get_frame_range(
        time_utils.FRAME_RANGE_MODE_CUSTOM_VALUE, 10, 12
    )
    assert fr == (10, 12)
    assert time_utils.convert_frame_range_to_frame_list(fr) == [10, 11, 12]

    sg = SceneGraph(frame_range=(1, 6))
    fr = time_utils.get_frame_range(
        time_utils.FRAME_RANGE_MODE_SCENE_VALUE, scene_graph=sg
    )
    assert fr == (1, 6)


def test_time_keyframe_times():
    from mayamatchmovesolver_tpu.scene import SceneGraph
    from mayamatchmovesolver_tpu.utils import time as time_utils

    sg = SceneGraph(frame_range=(1, 5))
    cam = sg.create_camera("cam", tx=np.array([0, 0, 1, 1, 1.0]),
                           tz=10.0)
    bnd = sg.create_bundle("b", tz=-5.0)
    sg.create_marker("m", camera=cam, bundle=bnd)
    _, attrs = sg.bake()
    times = time_utils.get_keyframe_times_for_attrs(
        attrs, [cam.attr("tx"), cam.attr("tz")], (1, 5)
    )
    assert times["tx"] == [1, 2, 3]
    assert times["tz"] == []


# ---- event ---------------------------------------------------------------


def test_event_registry():
    from mayamatchmovesolver_tpu.utils import event

    event.clear_event_registry()
    calls = []
    event.add_function_to_event("solve_done", lambda **kw: calls.append(kw))
    n = event.trigger_event("solve_done", value=3)
    assert n == 1 and calls == [{"value": 3}]

    with event.BlockedEvents(["solve_done"]):
        assert event.trigger_event("solve_done") == 0
    assert event.trigger_event("solve_done") == 1

    event.add_function_to_event("later", lambda **kw: calls.append("later"),
                                deferred=True)
    event.trigger_event("later")
    assert "later" not in calls
    assert event.flush_deferred() == 1
    assert "later" in calls
    event.clear_event_registry()


# ---- sort ------------------------------------------------------------------


def test_sort_strings_with_digits():
    from mayamatchmovesolver_tpu.utils.sort import sort_strings_with_digits

    assert sort_strings_with_digits(["a10", "a2", "a1"]) == [
        "a1", "a2", "a10",
    ]
    assert sort_strings_with_digits(["b", "a03x2", "a3x10"]) == [
        "a03x2", "a3x10", "b",
    ]


# ---- converttypes ----------------------------------------------------------


def test_converttypes():
    from mayamatchmovesolver_tpu.utils import converttypes as ct

    assert ct.string_to_boolean("Yes") is True
    assert ct.string_to_boolean("0") is False
    with pytest.raises(ValueError):
        ct.string_to_boolean("maybe")
    assert ct.boolean_to_string(True) == "True"

    assert ct.string_to_int_list("1001,1003-1005,1010") == [
        1001, 1003, 1004, 1005, 1010,
    ]
    assert ct.string_to_int_list("") == []
    assert ct.int_list_to_string([5, 1, 2, 3, 10]) == "1-3,5,10"
    assert ct.int_list_to_string([]) == ""
    assert ct.string_to_integer("42") == 42
    # Round trip.
    s = "1-3,5,10"
    assert ct.int_list_to_string(ct.string_to_int_list(s)) == s


# ---- imageseq ---------------------------------------------------------------


def test_imageseq(tmp_path):
    from mayamatchmovesolver_tpu.utils import imageseq

    for f in (998, 999, 1000, 1001):
        (tmp_path / ("plate.%04d.exr" % f)).write_bytes(b"")
    path = str(tmp_path / "plate.0999.exr")

    pattern, start, end, pad, is_seq = imageseq.expand_image_sequence_path(
        path, imageseq.IMAGE_SEQ_FORMAT_STYLE_HASH_PADDED
    )
    assert (start, end, pad, is_seq) == (998, 1001, 4, True)
    assert pattern.endswith("plate.####.exr")
    assert imageseq.frame_path(pattern, 999).endswith("plate.0999.exr")

    pattern, _, _, _, _ = imageseq.expand_image_sequence_path(
        path, imageseq.IMAGE_SEQ_FORMAT_STYLE_PRINTF
    )
    assert pattern.endswith("plate.%04d.exr")
    assert imageseq.frame_path(pattern, 1000).endswith("plate.1000.exr")

    pattern, _, _, _, _ = imageseq.expand_image_sequence_path(
        path, imageseq.IMAGE_SEQ_FORMAT_STYLE_FIRST_FRAME
    )
    assert pattern.endswith("plate.0998.exr")

    # Single file: not a sequence.
    single = tmp_path / "one.exr"
    single.write_bytes(b"")
    _, _, _, _, is_seq = imageseq.expand_image_sequence_path(
        str(single), imageseq.IMAGE_SEQ_FORMAT_STYLE_HASH_PADDED
    )
    assert is_seq is False
