"""Round-2 verify drive: SolverCamera end-to-end, sequential per-frame
solve, smoothness-weighted solve, 2-layer lens stack — on the default
(axon TPU) backend."""

import numpy as np
import jax.numpy as jnp

import mayamatchmovesolver_tpu.api as mmapi
from mayamatchmovesolver_tpu.core.constants import FilmFit
from mayamatchmovesolver_tpu.scene import SceneGraph, evaluate, flatscene
from mayamatchmovesolver_tpu.solver.solve import (
    SolverOptions, build_stiffness, solve, solve_per_frame,
)

F = 12
M = 10
RW, RH = 1500, 1000


def gt_tracks(focal=40.0):
    sg = SceneGraph(frame_range=(1, F))
    t = np.linspace(0, 1, F)
    cam = sg.create_camera(
        "cam", tx=4 * t, ty=0.3 * np.sin(3 * t), tz=8 - t,
        rx=np.zeros(F), ry=-12 * t, rz=np.zeros(F),
        focal_length_mm=focal, sensor_width_mm=36.0,
        sensor_height_mm=24.0, film_fit=FilmFit.HORIZONTAL,
        render_width=RW, render_height=RH,
    )
    rng = np.random.RandomState(1)
    pts = np.stack([rng.uniform(-3, 7, M), rng.uniform(-2, 3, M),
                    rng.uniform(-5, 1, M)], axis=-1)
    for i, p in enumerate(pts):
        b = sg.create_bundle("b%d" % i, tx=p[0], ty=p[1], tz=p[2])
        sg.create_marker("m%d" % i, camera=cam, bundle=b)
    scene, attrs = sg.bake()
    ev = evaluate(scene, attrs, jnp.arange(F))
    fsx, fsy = flatscene.marker_fit_scale(scene, attrs, jnp.arange(F))
    return np.asarray(ev.point_xy), (np.asarray(fsx), np.asarray(fsy))


def drive_camera_solve():
    tracks, (fsx, fsy) = gt_tracks(40.0)
    sg = SceneGraph(frame_range=(1, F))
    z = np.zeros(F)
    cam = sg.create_camera(
        "cam", tx=z, ty=z, tz=z, rx=z, ry=z, rz=z,
        focal_length_mm=35.0, sensor_width_mm=36.0,
        sensor_height_mm=24.0, film_fit=FilmFit.HORIZONTAL,
        render_width=RW, render_height=RH,
    )
    markers = []
    for i in range(M):
        b = sg.create_bundle("b%d" % i, tx=0.0, ty=0.0, tz=0.0)
        markers.append(sg.create_marker(
            "m%d" % i, camera=cam, bundle=b,
            tx=tracks[i, :, 0] / fsx[i], ty=tracks[i, :, 1] / fsy[i],
        ))
    col = mmapi.Collection(sg)
    col.add_marker(*markers)
    col.set_solver(mmapi.SolverCamera(frame_indices=range(F),
                                      solve_focal=True,
                                      refine_rounds=1,
                                      ba_iterations=30))
    attrs_out, results = mmapi.execute(col)
    r = results[0]
    focal = float(np.asarray(attrs_out.static_values)[
        cam.attr("focal_length_mm").code // 2])
    print("CAMERA_SOLVE:", r.reason_string)
    print("CAMERA_SOLVE error_avg=%.4f focal=%.3f success=%s"
          % (r.error_avg, focal, r.success))
    assert r.success and r.error_avg < 1.0 and abs(focal - 40.0) < 1.0


def drive_perframe_and_smoothness():
    sg = SceneGraph(frame_range=(1, F))
    cam = sg.create_camera(
        "cam", tz=10.0, focal_length_mm=35.0,
        film_fit=FilmFit.HORIZONTAL,
        render_width=RW, render_height=RH,
    )
    true_tx = np.linspace(-2, 2, F)
    bnd = sg.create_bundle("bnd", tx=np.zeros(F), ty=np.zeros(F),
                           tz=np.zeros(F))
    mkr = sg.create_marker("mkr", camera=cam, bundle=bnd)
    scene, attrs = sg.bake()
    gt = SceneGraph(frame_range=(1, F))
    gcam = gt.create_camera("cam", tz=10.0, focal_length_mm=35.0,
                            film_fit=FilmFit.HORIZONTAL,
                            render_width=RW, render_height=RH)
    gb = gt.create_bundle("bnd", tx=true_tx, ty=np.zeros(F),
                          tz=np.zeros(F))
    gt.create_marker("mkr", camera=gcam, bundle=gb)
    gscene, gattrs = gt.bake()
    ev = evaluate(gscene, gattrs, jnp.arange(F))
    track = np.array(ev.point_xy)  # writable copy (asarray view is RO)
    track += 2e-3 * np.random.RandomState(7).standard_normal(track.shape)
    attrs = flatscene.set_marker_screen_positions(
        scene, attrs, jnp.arange(F), jnp.asarray(track))

    a_seq, r_seq = solve_per_frame(
        scene, attrs, range(F), [bnd.attr("tx")],
        SolverOptions(iterations=20), sequential=True)
    print("SEQUENTIAL per-frame: success=%s err=%.4f reverted=%d"
          % (r_seq.success, r_seq.error_final,
             sum(r_seq.per_frame_reverted)))
    assert r_seq.success

    stiff = build_stiffness(attrs, [bnd.attr("tx")], range(F),
                            weight=3.0, variance=0.02, mode="smoothness")
    a_sm, r_sm = solve(scene, attrs, range(F), [bnd.attr("tx")],
                       SolverOptions(iterations=30), stiffness=stiff)
    curve_sm = np.asarray(a_sm.anim_values)[bnd.attr("tx").code // 2]
    curve_raw = np.asarray(a_seq.anim_values)[bnd.attr("tx").code // 2]
    w_sm = np.abs(np.diff(curve_sm, 2)).sum()
    w_raw = np.abs(np.diff(curve_raw, 2)).sum()
    print("SMOOTHNESS wiggle: raw=%.5f smoothed=%.5f" % (w_raw, w_sm))
    assert w_sm < w_raw


def drive_lens_stack():
    from mayamatchmovesolver_tpu.io import lensfile
    from mayamatchmovesolver_tpu.models import scenelens

    layers = lensfile.LensLayers()
    layers.layers.append(lensfile.LensLayer(
        model_type=scenelens.LENS_MODEL_CLASSIC,
        parameters={"distortion": {None: 0.12}}))
    layers.layers.append(lensfile.LensLayer(
        model_type=scenelens.LENS_MODEL_RADIAL_DEG4,
        parameters={"degree2_distortion": {None: 0.05}}))
    sg = SceneGraph(frame_range=(1, 1))
    cam = sg.create_camera("cam", tz=10.0, render_width=RW,
                           render_height=RH)
    created = scenelens.attach_lens_file(sg, cam, layers)
    b = sg.create_bundle("b", tx=1.0, tz=-5.0)
    sg.create_marker("m", camera=cam, bundle=b)
    lens = scenelens.bake_scene_lens(sg)
    scene, attrs = sg.bake()
    pts = jnp.asarray(np.random.RandomState(0).uniform(-0.4, 0.4,
                                                       (1, 1, 2)))
    out = scenelens.apply_scene_lens(
        lens, scene, attrs, jnp.asarray([0]), pts, scene.mkr_cam_index)
    back = scenelens.apply_scene_lens(
        lens, scene, attrs, jnp.asarray([0]), out, scene.mkr_cam_index,
        direction="undistort")
    err = float(np.abs(np.asarray(back) - np.asarray(pts)).max())
    print("LENS_STACK layers=%s roundtrip_err=%.2e"
          % (lens.model_types[0], err))
    assert err < 1e-5


drive_camera_solve()
drive_perframe_and_smoothness()
drive_lens_stack()
print("DRIVE_OK")


def drive_new_surface():
    """Round-2 session additions: EXR RLE, native anamorphic, CLI verbs,
    vanishing calibration."""
    import json
    import os
    import numpy as onp

    from mayamatchmovesolver_tpu import cli, models, native
    from mayamatchmovesolver_tpu.io import exr
    from mayamatchmovesolver_tpu.ops import stmap as stmap_mod
    from mayamatchmovesolver_tpu.sfm import vanishing

    # EXR RLE round-trip.
    img = onp.random.RandomState(0).rand(16, 24, 4).astype(onp.float32)
    exr.write_pixels("/tmp/_drive_rle.exr", img,
                     compression=exr.COMPRESSION_RLE)
    back, hdr = exr.read_pixels("/tmp/_drive_rle.exr")
    assert hdr["compression"] == exr.COMPRESSION_RLE
    assert onp.array_equal(back, img)
    print("EXR_RLE ok")

    # Native anamorphic vs XLA oracle.
    params = (0.03, 0.02, 0.01, -0.015, 0.004, -0.003, 0.002, 0.001,
              -0.0005, 0.0008, 4.0, 1.1, 0.95)
    fb = models.FilmBack.create(width_cm=3.6, height_cm=2.4)
    model = models.TdeAnamorphicStdDeg4.create(
        degree2_cx02=params[0], degree2_cy02=params[1],
        degree2_cx22=params[2], degree2_cy22=params[3],
        degree4_cx04=params[4], degree4_cy04=params[5],
        degree4_cx24=params[6], degree4_cy24=params[7],
        degree4_cx44=params[8], degree4_cy44=params[9],
        lens_rotation=params[10], squeeze_x=params[11],
        squeeze_y=params[12])
    fast = native.stmap_anamorphic_deg4(
        params, (3.6, 2.4, 0.0, 0.0, 1.0), 48, 32, "distort")
    oracle = onp.asarray(stmap_mod.stmap_xla(model, fb, 48, 32, "distort"))
    err = onp.abs(fast[..., :2] - oracle[..., :2]).max()
    print("NATIVE_ANAMORPHIC maxerr=%.2e" % err)
    assert err < 2e-5

    # CLI: reproject + image-info + image-convert.
    with open("/tmp/_drive_cam.json", "w") as f:
        json.dump({"camera": {"tx": [0.0], "ty": [0.0], "tz": [10.0],
                              "rx": [0.0], "ry": [0.0], "rz": [0.0]}}, f)
    with open("/tmp/_drive_pts.json", "w") as f:
        json.dump([[0.0, 0.0, 0.0]], f)
    rc = cli.main(["reproject", "--camera", "/tmp/_drive_cam.json",
                   "--points", "/tmp/_drive_pts.json",
                   "--space", "pixels",
                   "--output", "/tmp/_drive_reproj.json"])
    assert rc == 0
    xy = json.load(open("/tmp/_drive_reproj.json"))["points"]
    assert abs(xy[0][0][0] - 960.0) < 1e-6, xy
    rc = cli.main(["image-convert", "/tmp/_drive_rle.exr",
                   "/tmp/_drive_small.exr", "--scale", "0.5"])
    assert rc == 0
    assert cli.main(["image-info", "/tmp/_drive_small.exr"]) == 0
    print("CLI_VERBS ok")

    # Vanishing-point calibration recovers focal.
    a = onp.array([0.35, 0.12, -0.95]); a /= onp.linalg.norm(a)
    b = onp.array([-0.15, 0.9, -0.55]); b -= a * (a @ b)
    b /= onp.linalg.norm(b)
    f_factor = 2.0 * 35.0 / 36.0
    pp = onp.zeros(2)
    vp = lambda c: pp - f_factor * c[:2] / c[2]
    calib = vanishing.calibrate_two_vanishing_points(
        35.0, 36.0, 24.0, pp, pp, vp(a), vp(b))
    print("VANISHING focal=%.3f" % float(calib.focal_length_mm))
    assert abs(float(calib.focal_length_mm) - 35.0) < 1e-6


drive_new_surface()
print("DRIVE_R2_ALL_OK")
