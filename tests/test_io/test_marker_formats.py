"""Marker file format round trips — pure host-side, no XLA."""

import json
import os

import numpy as np

from mayamatchmovesolver_tpu import io as mmio


def test_uvtrack_v1_parse(tmp_path):
    path = os.path.join(tmp_path, "t.uv")
    with open(path, "w") as f:
        f.write("1\n")
        f.write("my_track\n")
        f.write("3\n")
        f.write("1 0.5 0.5 1.0\n")
        f.write("2 0.55 0.52 0.9\n")
        f.write("4 0.6 0.54 1.0\n")
    info, data = mmio.uvtrack.parse(path)
    assert info.marker_undistorted
    assert len(data) == 1
    md = data[0]
    assert md.name == "my_track"
    assert md.x.get_value(1) == 0.5
    assert md.weight.get_value(2) == 0.9
    # Occluded frame 3 disabled with zero weight.
    assert md.enable.get_value(3) == 0
    assert md.weight.get_value(3) == 0.0


def test_uvtrack_v4_round_trip(tmp_path):
    md = mmio.MarkerData(name="p1", id="0001", group_name="setA")
    for frame in (1, 2, 3):
        md.x.set_value(frame, 0.4 + frame * 0.01)
        md.y.set_value(frame, 0.5)
        md.weight.set_value(frame, 1.0)
        md.enable.set_value(frame, 1)
    md.bundle_x, md.bundle_y, md.bundle_z = 1.0, 2.0, -3.0
    path = os.path.join(tmp_path, "t.uv")
    mmio.uvtrack.write_v4(
        path,
        [md],
        camera_block={
            "resolution": [1920, 1080],
            "film_back_cm": [3.6, 2.4],
            "per_frame": [
                {"frame": 1, "focal_length_cm": 3.5},
            ],
        },
    )
    info, data = mmio.uvtrack.parse(path)
    assert info.bundle_positions
    assert info.camera_field_of_view
    frame, ax, ay = info.camera_field_of_view[0]
    assert frame == 1
    np.testing.assert_allclose(
        ax, np.degrees(2 * np.arctan(3.6 / (2 * 3.5))), atol=1e-9
    )
    md2 = data[0]
    assert md2.name == "p1"
    assert md2.bundle_z == -3.0
    np.testing.assert_allclose(md2.x.get_value(2), 0.42, atol=1e-12)


def test_uvtrack_v3_distorted_choice(tmp_path):
    data = {
        "version": 3,
        "points": [
            {
                "name": "p",
                "per_frame": [
                    {
                        "frame": 1,
                        "pos": [0.5, 0.5],
                        "pos_dist": [0.52, 0.49],
                        "weight": 1.0,
                    }
                ],
                "3d": {"x": 0.0, "y": 1.0, "z": 2.0},
            }
        ],
    }
    path = os.path.join(tmp_path, "t.uv")
    with open(path, "w") as f:
        json.dump(data, f)
    _, und = mmio.uvtrack.parse(path, undistorted=True)
    _, dist = mmio.uvtrack.parse(path, undistorted=False)
    assert und[0].x.get_value(1) == 0.5
    assert dist[0].x.get_value(1) == 0.52
    assert und[0].bundle_y == 1.0


def test_tdetxt_parse(tmp_path):
    path = os.path.join(tmp_path, "t.txt")
    with open(path, "w") as f:
        f.write("1\n")
        f.write("track_a\n")
        f.write("0\n")  # color
        f.write("2\n")
        f.write("1 960.0 540.0\n")
        f.write("2 970.0 550.0\n")
    info, data = mmio.tdetxt.parse(path, image_width=1920,
                                   image_height=1080)
    md = data[0]
    np.testing.assert_allclose(md.x.get_value(1), 0.5, atol=1e-12)
    np.testing.assert_allclose(md.y.get_value(2), 550.0 / 1080.0,
                               atol=1e-12)


def test_pftrack2dt_parse(tmp_path):
    path = os.path.join(tmp_path, "t.2dt")
    with open(path, "w") as f:
        f.write('"trackerA"\n')
        f.write("1\n")  # clip number
        f.write("2\n")
        f.write("1 959.5 539.5 0.1\n")
        f.write("2 960.5 540.5 0.1 12.0\n")
    info, data = mmio.pftrack2dt.parse(path, image_width=1920,
                                       image_height=1080)
    md = data[0]
    np.testing.assert_allclose(md.x.get_value(1), 0.5, atol=1e-12)
    np.testing.assert_allclose(md.y.get_value(2), 541.0 / 1080.0,
                               atol=1e-12)


def test_rz2_parse(tmp_path):
    path = os.path.join(tmp_path, "t.rz2")
    with open(path, "w") as f:
        f.write(
            'imageSequence\n{\n1920 1080 f( "/tmp/img.#.jpg" ) '
            "b( 1 3 1 )\n}\n"
        )
        f.write('pointTrack "pt1"\n{\n')
        f.write("1 960.0 540.0\n")
        f.write("2 970.0 550.0\n")
        f.write("}\n")
    info, data = mmio.rz2.parse(path)
    md = data[0]
    np.testing.assert_allclose(md.x.get_value(1), 0.5, atol=1e-12)
    # y flipped: top-left origin.
    np.testing.assert_allclose(md.y.get_value(1), 0.5, atol=1e-12)
    np.testing.assert_allclose(
        md.y.get_value(2), (550.0 / 1080.0) * -1 + 1.0, atol=1e-12
    )
    assert md.enable.get_value(3) == 0


def test_format_manager_dispatch(tmp_path):
    path = os.path.join(tmp_path, "x.2dt")
    with open(path, "w") as f:
        f.write('"t"\n1\n1\n1 0.5 0.5 0.0\n')
    info, data = mmio.read(path, image_width=1.0, image_height=1.0)
    assert len(data) == 1
