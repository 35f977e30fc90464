"""Command-line interface.

Replaces the reference's Maya-command surface with a standalone CLI
(SURVEY.md section 7 step 8): the capabilities of the mmSolver /
mmCameraSolve commands and the tools/lensdistortion binary
(ref: src/mmSolver/cmd/MMSolverCmd.cpp:109, MMCameraSolveCmd,
tools/lensdistortion/src/main.cpp).

    python -m mayamatchmovesolver_tpu.cli solve --markers t.uv ...
    python -m mayamatchmovesolver_tpu.cli camera-solve --markers t.uv ...
    python -m mayamatchmovesolver_tpu.cli lensdistort --model tde_classic
        --distortion 0.1 --width 1920 --height 1080 --output st.exr
    python -m mayamatchmovesolver_tpu.cli formats
"""

import argparse
import json
import sys

import numpy as np


def _cmd_formats(args):
    from mayamatchmovesolver_tpu.io import get_formats

    for ext, name in sorted(get_formats().items()):
        print("%s\t%s" % (ext, name))
    return 0


def _load_markers(path, image_width, image_height):
    from mayamatchmovesolver_tpu.io import read

    info, mkr_data = read(
        path, image_width=image_width, image_height=image_height
    )
    if not mkr_data:
        raise SystemExit("no markers parsed from %r" % path)
    return info, mkr_data


def _marker_arrays(mkr_data, start, end):
    frames = list(range(start, end + 1))
    m = len(mkr_data)
    f = len(frames)
    uv = np.zeros((m, f, 2))
    enable = np.zeros((m, f))
    for i, md in enumerate(mkr_data):
        for fi, frame in enumerate(frames):
            x = md.x.get_value(frame)
            y = md.y.get_value(frame)
            if x is None or y is None:
                continue
            uv[i, fi] = (x - 0.5, y - 0.5)
            enable[i, fi] = float(md.enable.get_value(frame, 1))
    return uv, enable, frames


def _frame_range_of(mkr_data):
    lo, hi = None, None
    for md in mkr_data:
        rng = md.frame_range()
        if rng is None:
            continue
        lo = rng[0] if lo is None else min(lo, rng[0])
        hi = rng[1] if hi is None else max(hi, rng[1])
    if lo is None:
        raise SystemExit("markers contain no frames")
    return lo, hi


def _cmd_camera_solve(args):
    from mayamatchmovesolver_tpu.sfm import camerasolve

    _, mkr_data = _load_markers(
        args.markers, args.image_width, args.image_height
    )
    start, end = (
        (args.start_frame, args.end_frame)
        if args.start_frame is not None
        else _frame_range_of(mkr_data)
    )
    uv, enable, frames = _marker_arrays(mkr_data, start, end)
    result = camerasolve.camera_solve(
        uv, enable,
        focal_length_mm=args.focal_length,
        film_back_width_mm=args.film_back_width,
        film_back_height_mm=args.film_back_height,
    )
    result = camerasolve.set_origin_frame(result)
    out = {
        "frames": frames,
        "camera": {
            "positions": result.positions.tolist(),
            "rotations": result.rotations.tolist(),
            "frame_solved": result.frame_solved.tolist(),
        },
        "points": {
            "positions": result.points3d.tolist(),
            "valid": result.point_valid.tolist(),
            "names": [md.name for md in mkr_data],
        },
    }
    text = json.dumps(out, indent=1)
    if args.output:
        with open(args.output, "w") as f:
            f.write(text)
        print("wrote %s (%d frames solved, %d points)" % (
            args.output, int(result.frame_solved.sum()),
            int(result.point_valid.sum()),
        ))
    else:
        print(text)
    return 0


def _cmd_solve(args):
    """Refine camera pose per frame against markers with known 3D
    bundle positions (uvtrack v3/v4 '3d' blocks), or triangulated ones."""
    from mayamatchmovesolver_tpu.core.constants import FilmFit
    from mayamatchmovesolver_tpu.io import markers_to_scene
    from mayamatchmovesolver_tpu.scene import SceneGraph
    from mayamatchmovesolver_tpu.solver import (
        SolverOptions,
        solve_per_frame,
    )

    _, mkr_data = _load_markers(
        args.markers, args.image_width, args.image_height
    )
    start, end = (
        (args.start_frame, args.end_frame)
        if args.start_frame is not None
        else _frame_range_of(mkr_data)
    )
    sg = SceneGraph(frame_range=(start, end))
    n = sg.num_frames
    cam = sg.create_camera(
        "cam",
        tx=np.zeros(n), ty=np.zeros(n), tz=np.zeros(n),
        rx=np.zeros(n), ry=np.zeros(n), rz=np.zeros(n),
        focal_length_mm=args.focal_length,
        sensor_width_mm=args.film_back_width,
        sensor_height_mm=args.film_back_height,
        film_fit=FilmFit.HORIZONTAL,
        render_width=args.image_width or 1920,
        render_height=args.image_height or 1080,
    )
    markers_to_scene(mkr_data, sg, cam)
    scene, attrs = sg.bake()

    options = SolverOptions(
        iterations=args.iterations,
        image_width=float(args.image_width or 1920),
    )
    solve_attrs = [cam.attr(c) for c in ("tx", "ty", "tz",
                                         "rx", "ry", "rz")]
    new_attrs, result = solve_per_frame(
        scene, attrs, list(range(n)), solve_attrs, options
    )
    for line in result.as_key_value_strings():
        print(line)
    if args.output:
        anim = np.asarray(new_attrs.anim_values)
        out = {
            "frames": list(range(start, end + 1)),
            "camera": {
                c: anim[cam.attr(c).code // 2].tolist()
                for c in ("tx", "ty", "tz", "rx", "ry", "rz")
            },
        }
        with open(args.output, "w") as f:
            json.dump(out, f, indent=1)
        print("wrote %s" % args.output)
    return 0 if result.success else 1


def _cmd_lensdistort(args):
    from mayamatchmovesolver_tpu import models
    from mayamatchmovesolver_tpu.io import exr
    from mayamatchmovesolver_tpu.models import scenelens
    from mayamatchmovesolver_tpu.ops import stmap as stmap_mod

    fb = models.FilmBack.create(
        width_cm=args.film_back_width / 10.0,
        height_cm=args.film_back_height / 10.0,
    )
    if args.model == scenelens.LENS_MODEL_CLASSIC:
        model = models.TdeClassic.create(
            distortion=args.distortion,
            anamorphic_squeeze=args.anamorphic_squeeze,
            curvature_x=args.curvature_x,
            curvature_y=args.curvature_y,
            quartic_distortion=args.quartic_distortion,
        )
    elif args.model == scenelens.LENS_MODEL_RADIAL_DEG4:
        model = models.TdeRadialStdDeg4.create(
            degree2_distortion=args.distortion,
            degree4_distortion=args.quartic_distortion,
        )
    else:
        raise SystemExit("unsupported model for CLI: %r" % args.model)

    image = np.asarray(
        stmap_mod.stmap(model, fb, args.width, args.height,
                    direction=args.direction)
    )
    exr.write_pixels(args.output, image)
    print(
        "wrote %s (%dx%d %s ST map)"
        % (args.output, args.width, args.height, args.direction)
    )
    return 0


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="mmsolver-tpu",
        description="TPU-native matchmove solver CLI",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    sub.add_parser("formats", help="list marker file formats")

    def add_marker_args(p):
        p.add_argument("--markers", required=True)
        p.add_argument("--image-width", type=int, default=1920)
        p.add_argument("--image-height", type=int, default=1080)
        p.add_argument("--start-frame", type=int, default=None)
        p.add_argument("--end-frame", type=int, default=None)
        p.add_argument("--focal-length", type=float, default=35.0)
        p.add_argument("--film-back-width", type=float, default=36.0)
        p.add_argument("--film-back-height", type=float, default=24.0)
        p.add_argument("--output", default=None)

    p = sub.add_parser("camera-solve",
                       help="SfM bootstrap: solve camera from 2D tracks")
    add_marker_args(p)

    p = sub.add_parser("solve", help="per-frame pose refinement solve")
    add_marker_args(p)
    p.add_argument("--iterations", type=int, default=20)

    p = sub.add_parser("lensdistort", help="write a lens ST-map EXR")
    p.add_argument("--model", default="tde_classic")
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--direction", choices=["distort", "undistort"],
                   default="distort")
    p.add_argument("--distortion", type=float, default=0.0)
    p.add_argument("--anamorphic-squeeze", type=float, default=1.0)
    p.add_argument("--curvature-x", type=float, default=0.0)
    p.add_argument("--curvature-y", type=float, default=0.0)
    p.add_argument("--quartic-distortion", type=float, default=0.0)
    p.add_argument("--film-back-width", type=float, default=36.0)
    p.add_argument("--film-back-height", type=float, default=24.0)
    p.add_argument("--output", required=True)

    args = parser.parse_args(argv)
    if args.command == "formats":
        return _cmd_formats(args)
    if args.command == "camera-solve":
        return _cmd_camera_solve(args)
    if args.command == "solve":
        return _cmd_solve(args)
    if args.command == "lensdistort":
        return _cmd_lensdistort(args)
    parser.error("unknown command")


if __name__ == "__main__":
    sys.exit(main())
