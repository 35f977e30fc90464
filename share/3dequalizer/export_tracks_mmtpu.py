# 3DE4.script.name:     Export 2D Tracks (mmtpu uvtrack)...
# 3DE4.script.version:  v1.0
# 3DE4.script.gui:      Main Window::mmtpu
# 3DE4.script.comment:  Writes the selected points' 2D tracking curves
# 3DE4.script.comment:  (with per-frame weights, plus solved 3D
# 3DE4.script.comment:  positions when available) to a uvtrack v4 JSON
# 3DE4.script.comment:  file readable by mayamatchmovesolver_tpu
# 3DE4.script.comment:  (io/uvtrack.py) and by mmSolver's Load Markers.
#
"""3DEqualizer-side exporter for the uvtrack format.

Runs INSIDE 3DEqualizer (the `tde4` module is provided by the host
application); the counterpart of the reference's
share/3dequalizer exporter scripts, written from scratch against the
published tde4 Python API.  2D positions are resolution-independent
UV in [0, 1] with v up — exactly what io/uvtrack.py parses.
"""

import json

import tde4  # provided by 3DEqualizer


def _camera_block(camera, lens, frames):
    fb_w_cm = tde4.getLensFBackWidth(lens)
    fb_h_cm = tde4.getLensFBackHeight(lens)
    per_frame = []
    for frame in range(1, frames + 1):
        focal_cm = tde4.getCameraFocalLength(camera, frame)
        per_frame.append(
            {
                "frame": frame,
                "focal_length_cm": focal_cm,
            }
        )
    return {
        "film_back_cm": [fb_w_cm, fb_h_cm],
        "lens_center_offset_cm": [
            tde4.getLensLensCenterX(lens),
            tde4.getLensLensCenterY(lens),
        ],
        "per_frame": per_frame,
    }


def export_selected_points(file_path):
    point_group = tde4.getCurrentPGroup()
    camera = tde4.getCurrentCamera()
    if point_group is None or camera is None:
        raise RuntimeError("no current point group / camera")
    frames = tde4.getCameraNoFrames(camera)
    lens = tde4.getCameraLens(camera)

    points = []
    for point in tde4.getPointList(point_group, 1):  # selected only
        name = tde4.getPointName(point_group, point)
        curve = tde4.getPointPosition2DBlock(
            point_group, point, camera, 1, frames
        )
        per_frame = []
        for i, pos in enumerate(curve):
            frame = i + 1
            if not tde4.isPointPos2DValid(
                point_group, point, camera, frame
            ):
                continue
            weight = tde4.getPointWeightByFrame(
                point_group, point, camera, frame
            )
            row = {
                "frame": frame,
                "pos": [pos[0], pos[1]],
                "pos_dist": [pos[0], pos[1]],
                "weight": weight,
            }
            per_frame.append(row)
        entry = {
            "name": name,
            "id": None,
            "set_name": tde4.getPGroupName(point_group),
            "per_frame": per_frame,
        }
        if tde4.isPointCalculated3D(point_group, point):
            x, y, z = tde4.getPointCalcPosition3D(point_group, point)
            entry["3d"] = {
                "x": x, "y": y, "z": z,
                "x_lock": True, "y_lock": True, "z_lock": True,
            }
        points.append(entry)

    data = {
        "version": 4,
        "num_points": len(points),
        "is_undistorted": None,
        "points": points,
        "camera": _camera_block(camera, lens, frames),
    }
    with open(file_path, "w") as f:
        json.dump(data, f, indent=1)
    return len(points)


def main():
    req = tde4.createCustomRequester()
    tde4.addFileWidget(req, "file_browser", "uvtrack file...", "*.uv")
    ok = tde4.postCustomRequester(
        req, "Export 2D Tracks (mmtpu uvtrack)", 600, 0, "Export",
        "Cancel",
    )
    if ok == 1:
        path = tde4.getWidgetValue(req, "file_browser")
        if path:
            n = export_selected_points(path)
            tde4.postQuestionRequester(
                "Export 2D Tracks",
                "wrote %d point(s) to %s" % (n, path), "Ok",
            )


if __name__ == "__main__":
    main()
