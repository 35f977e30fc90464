"""SynthEyes-side exporter for the uvtrack format.

Runs OUTSIDE SynthEyes against its published SyPy Python API (the
counterpart of the reference's share/syntheyes Sizzle exporter,
written from scratch): connects to a running SynthEyes instance,
reads the active shot's trackers, and writes uvtrack v4 JSON readable
by mayamatchmovesolver_tpu (io/uvtrack.py) and mmSolver's Load
Markers.

SynthEyes tracker coordinates are [-1, 1] with v DOWN and span the
image width; uvtrack wants [0, 1] v up — converted below like the
reference's exporter documents.

Usage:  python export_uvtrack_mmtpu.py out.uv
"""

import json
import sys


def _to_uv(u, v, aspect):
    """SynthEyes [-1, 1] (v down, u spanning width) -> UV [0, 1] v up."""
    return (u + 1.0) * 0.5, 1.0 - (v * aspect + 1.0) * 0.5


def export_tracks(file_path):
    import SyPy  # provided by the SynthEyes installation

    hle = SyPy.SyLevel()
    hle.OpenExisting()
    sht = hle.Active()
    if sht is None:
        raise RuntimeError("no active shot in SynthEyes")
    aspect = float(sht.Get("aspect"))
    start = int(sht.Get("start"))
    stop = int(sht.Get("stop"))

    points = []
    for trk in hle.Trackers():
        if not int(trk.Get("isExported")):
            continue
        per_frame = []
        for frame in range(start, stop + 1):
            hle.SetSzlFrame(frame)
            if not int(trk.Get("valid")):
                continue
            u, v = float(trk.Get("u")), float(trk.Get("v"))
            uu, vv = _to_uv(u, v, aspect)
            per_frame.append(
                {
                    "frame": frame,
                    "pos": [uu, vv],
                    "pos_dist": [uu, vv],
                    "weight": 1.0,
                }
            )
        entry = {
            "name": trk.Name(),
            "id": None,
            "set_name": "",
            "per_frame": per_frame,
        }
        if int(trk.Get("hasSolved")):
            entry["3d"] = {
                "x": float(trk.Get("solvedX")),
                "y": float(trk.Get("solvedY")),
                "z": float(trk.Get("solvedZ")),
                "x_lock": True, "y_lock": True, "z_lock": True,
            }
        points.append(entry)

    data = {
        "version": 4,
        "num_points": len(points),
        "is_undistorted": None,
        "points": points,
    }
    with open(file_path, "w") as f:
        json.dump(data, f, indent=1)
    return len(points)


if __name__ == "__main__":
    if len(sys.argv) != 2:
        raise SystemExit("usage: export_uvtrack_mmtpu.py out.uv")
    n = export_tracks(sys.argv[1])
    print("wrote %d tracker(s) to %s" % (n, sys.argv[1]))
