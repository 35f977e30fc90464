"""Tool data-capability tests (ref tool packages listed per test)."""

import numpy as np
import jax.numpy as jnp

from mayamatchmovesolver_tpu.core.constants import FilmFit
from mayamatchmovesolver_tpu.scene import SceneGraph, evaluate
from mayamatchmovesolver_tpu.tools import (
    attributebake,
    centertwodee,
    markertools,
    originframe,
    raycast,
    reparent,
    scaleadjust,
    screenspace,
)

F = 5


def _tracked_scene(lens_offset_x=0.0):
    sg = SceneGraph(frame_range=(1, F))
    cam = sg.create_camera(
        "cam",
        tx=np.linspace(-2, 2, F), ty=0.5, tz=10.0,
        ry=np.linspace(-5, 5, F),
        focal_length_mm=35.0, sensor_width_mm=36.0,
        sensor_height_mm=24.0, lens_offset_x_mm=lens_offset_x,
        film_fit=FilmFit.HORIZONTAL,
        render_width=1920, render_height=1080,
    )
    rng = np.random.RandomState(4)
    bundles = [
        sg.create_bundle("b%d" % i, tx=rng.uniform(-3, 3),
                         ty=rng.uniform(-2, 2), tz=rng.uniform(-8, -4))
        for i in range(4)
    ]
    markers = [
        sg.create_marker("m%d" % i, camera=cam, bundle=b,
                         tx=np.zeros(F), ty=np.zeros(F))
        for i, b in enumerate(bundles)
    ]
    return sg, cam, bundles, markers


def test_world_to_screen_matches_engine():
    """tools/screenspacetransform: world_to_screen agrees with the
    scene engine's own reprojection (incl. nonzero film offset)."""
    sg, cam, bundles, _ = _tracked_scene(lens_offset_x=3.0)
    scene, attrs = sg.bake()
    ev = evaluate(scene, attrs, jnp.arange(F))
    pts = ev.bnd_world_point[0]  # (F, 3) bundle 0 world positions
    xy, depth = screenspace.world_to_screen(ev, pts)
    np.testing.assert_allclose(
        np.asarray(xy), np.asarray(ev.point_xy[0]), atol=1e-12
    )
    assert np.all(np.asarray(depth) > 0)


def test_screen_to_world_round_trip():
    sg, cam, bundles, _ = _tracked_scene(lens_offset_x=2.0)
    scene, attrs = sg.bake()
    ev = evaluate(scene, attrs, jnp.arange(F))
    pts = ev.bnd_world_point[1]
    xy, depth = screenspace.world_to_screen(ev, pts)
    back = screenspace.screen_to_world(ev, xy, depth)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts),
                               atol=1e-9)


def test_rig_bake_unbake_round_trip():
    """tools/screenspacerigbake: bake to screen channels and back."""
    sg, cam, bundles, _ = _tracked_scene()
    scene, attrs = sg.bake()
    channels = screenspace.screen_space_rig_bake(
        scene, attrs, jnp.arange(F), bundles[2].index
    )
    world = screenspace.screen_space_rig_unbake(
        scene, attrs, jnp.arange(F), channels["screen_x"],
        channels["screen_y"], channels["depth"],
    )
    ev = evaluate(scene, attrs, jnp.arange(F))
    np.testing.assert_allclose(
        np.asarray(world),
        np.asarray(ev.tfm_world[bundles[2].index, :, :3, 3]),
        atol=1e-9,
    )


def test_center_two_dee_centers_target():
    """tools/centertwodee: computed film offsets re-center the target."""
    sg = SceneGraph(frame_range=(1, 1))
    cam = sg.create_camera(
        "cam", tz=10.0, focal_length_mm=35.0, sensor_width_mm=36.0,
        sensor_height_mm=24.0, film_fit=FilmFit.HORIZONTAL,
        render_width=1920, render_height=1080,
    )
    b = sg.create_bundle("b", tx=1.5, ty=-0.8, tz=-5.0)
    sg.create_marker("m", camera=cam, bundle=b)
    scene, attrs = sg.bake()
    ev = evaluate(scene, attrs, jnp.asarray([0]))
    assert abs(float(ev.point_xy[0, 0, 0])) > 0.01  # off-center now

    target = np.asarray(ev.bnd_world_point[0, 0])
    centertwodee.apply_center(sg, cam, [0], target)
    scene2, attrs2 = sg.bake()
    ev2 = evaluate(scene2, attrs2, jnp.asarray([0]))
    np.testing.assert_allclose(
        np.asarray(ev2.point_xy[0, 0]), [0.0, 0.0], atol=1e-9
    )


def test_center_remap_ranges():
    """ref: centertwodee/lib.py:37-79 lerp/inverse-lerp/remap."""
    assert centertwodee.lerp(0.0, 10.0, 0.25) == 2.5
    assert centertwodee.inverse_lerp(0.0, 10.0, 2.5) == 0.25
    assert centertwodee.remap(0, 100, -1.0, 1.0, 75.0) == 0.5


def test_reparent_preserves_world():
    """tools/reparent2: world matrices unchanged after reparent."""
    sg = SceneGraph(frame_range=(1, F))
    parent = sg.create_transform(
        "grp", tx=np.linspace(0, 3, F), ry=np.linspace(0, 40, F),
        sx=2.0, sy=2.0, sz=2.0,
    )
    child = sg.create_transform(
        "child", tx=np.linspace(1, 2, F), ty=np.ones(F),
        tz=np.zeros(F), rx=np.linspace(0, 10, F),
        ry=np.zeros(F), rz=np.zeros(F),
        sx=np.ones(F), sy=np.ones(F), sz=np.ones(F),
    )
    newp = sg.create_transform("newp", tx=-1.0, ry=25.0)
    cam = sg.create_camera("cam", tz=10.0)
    b = sg.create_bundle("b", tz=-5.0)
    sg.create_marker("m", camera=cam, bundle=b)

    child.parent = parent  # start under a moving, scaled parent
    scene, attrs = sg.bake()
    ev_before = evaluate(scene, attrs, jnp.arange(F))
    world_before = np.asarray(ev_before.tfm_world[child.index])

    reparent.reparent(sg, child, newp)
    scene2, attrs2 = sg.bake()
    ev_after = evaluate(scene2, attrs2, jnp.arange(F))
    np.testing.assert_allclose(
        np.asarray(ev_after.tfm_world[child.index]), world_before,
        atol=1e-9,
    )
    assert child.parent is newp


def test_reparent_rejects_cycle():
    sg = SceneGraph(frame_range=(1, 1))
    a = sg.create_transform("a")
    bnode = sg.create_transform("b")
    bnode.parent = a
    cam = sg.create_camera("cam", tz=10.0)
    bd = sg.create_bundle("bd", tz=-5.0)
    sg.create_marker("m", camera=cam, bundle=bd)
    try:
        reparent.reparent(sg, a, bnode)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_scene_scale_preserves_reprojection():
    """tools/cameraobjectscaleadjust: similarity rescale about the
    camera pivot leaves every reprojection unchanged."""
    sg, cam, bundles, _ = _tracked_scene()
    scene, attrs = sg.bake()
    ev_before = evaluate(scene, attrs, jnp.arange(F))

    scaleadjust.apply_scene_scale(sg, scale=3.7)
    scene2, attrs2 = sg.bake()
    ev_after = evaluate(scene2, attrs2, jnp.arange(F))
    np.testing.assert_allclose(
        np.asarray(ev_after.point_xy), np.asarray(ev_before.point_xy),
        atol=1e-9,
    )
    # And the scene really did scale.
    d_before = np.linalg.norm(
        np.asarray(ev_before.bnd_world_point[0, 0])
        - np.asarray(ev_before.bnd_world_point[1, 0])
    )
    d_after = np.linalg.norm(
        np.asarray(ev_after.bnd_world_point[0, 0])
        - np.asarray(ev_after.bnd_world_point[1, 0])
    )
    np.testing.assert_allclose(d_after / d_before, 3.7, rtol=1e-9)


def test_scale_factors():
    assert scaleadjust.scale_for_known_distance(
        [0, 0, 0], [0, 3, 4], 10.0
    ) == 2.0
    assert scaleadjust.scale_for_known_depth(
        [1, 0, 0], [1, 0, -2], 6.0
    ) == 3.0


def test_smart_bake_reconstruction():
    """tools/attributebake: reduced keys reproduce the dense samples."""
    frames = np.arange(60, dtype=np.float64)
    values = np.where(
        frames < 20, frames * 0.5,
        np.where(frames < 40, 10.0, 10.0 - (frames - 40) * 0.25),
    )
    kf, kv = attributebake.smart_bake_keys(frames, values, 1e-9)
    assert len(kf) <= 6  # three linear segments -> few keys
    recon = np.interp(frames, kf, kv)
    np.testing.assert_allclose(recon, values, atol=1e-8)


def test_smart_bake_tolerance_curve():
    frames = np.arange(50, dtype=np.float64)
    values = np.sin(frames * 0.2)
    kf, kv = attributebake.smart_bake_keys(frames, values, 0.01)
    assert 2 < len(kf) < 50
    recon = np.interp(frames, kf, kv)
    assert np.max(np.abs(recon - values)) <= 0.01 + 1e-12


def test_smooth_keyframes_blend():
    rng = np.random.RandomState(0)
    noisy = np.sin(np.linspace(0, 3, 40)) + rng.normal(0, 0.2, 40)
    half = attributebake.smooth_keyframes(
        noisy, mode="gaussian", width=3.0, blend=np.full(40, 0.5)
    )
    full = attributebake.smooth_keyframes(noisy, mode="gaussian",
                                          width=3.0)
    np.testing.assert_allclose(half, 0.5 * (noisy + full), atol=1e-12)


def test_average_and_duplicate_and_rename():
    sg, cam, bundles, markers = _tracked_scene()
    # averagemarker
    avg = markertools.create_average_marker(sg, markers[:2], "avg")
    scene, attrs = sg.bake()
    from mayamatchmovesolver_tpu.scene import attrblock

    frames = np.arange(F)
    xy = []
    for m in markers[:2] + [avg]:
        codes = np.array([m.attr("tx").code, m.attr("ty").code])
        xy.append(np.asarray(
            attrblock.gather_attr_values(attrs, codes, frames)
        ))
    np.testing.assert_allclose(xy[2], 0.5 * (xy[0] + xy[1]), atol=1e-12)

    # duplicatemarker
    dup = markertools.duplicate_marker(sg, markers[0])
    assert dup.bundle is markers[0].bundle
    scene, attrs = sg.bake()
    for ch in ("tx", "ty"):
        a = np.asarray(attrblock.gather_attr_values(
            attrs, np.array([markers[0].attr(ch).code]), frames))
        b = np.asarray(attrblock.gather_attr_values(
            attrs, np.array([dup.attr(ch).code]), frames))
        np.testing.assert_allclose(a, b)

    # markerbundlerename
    pairs = markertools.rename_markers_and_bundles(
        markers[:2], "track", start=3
    )
    assert pairs == [("track_03_MKR", "track_03_BND"),
                     ("track_04_MKR", "track_04_BND")]
    assert markers[0].name == "track_03_MKR"
    assert markers[0].bundle.name == "track_03_BND"


def test_marker_from_transform_matches_engine():
    """tools/convertmarker: a bundle transform converts to exactly the
    track the engine reprojects."""
    sg, cam, bundles, _ = _tracked_scene()
    scene, attrs = sg.bake()
    xy, behind = markertools.marker_from_transform(
        scene, attrs, np.arange(F), bundles[3].index
    )
    ev = evaluate(scene, attrs, jnp.arange(F))
    np.testing.assert_allclose(
        np.asarray(xy), np.asarray(ev.point_xy[3]), atol=1e-12
    )
    assert not np.any(np.asarray(behind))


def test_reproject_bundle_snaps_to_marker_ray():
    """tools/reprojectbundle: after snapping, the bundle reprojects
    onto the marker position at the chosen frame."""
    sg, cam, bundles, markers = _tracked_scene()
    scene, attrs = sg.bake()
    # Write a marker position away from the bundle's projection.
    from mayamatchmovesolver_tpu.scene import attrblock

    attrs = attrblock.set_attr_values(
        attrs, markers[0].attr("tx").code, np.full(F, 0.1)
    )
    attrs = attrblock.set_attr_values(
        attrs, markers[0].attr("ty").code, np.full(F, -0.05)
    )
    new_pos = markertools.reproject_bundle(
        scene, attrs, np.arange(F), 0, frame_for_depth=2
    )
    attrs2 = attrs
    for ci, ch in enumerate(("tx", "ty", "tz")):
        attrs2 = attrblock.set_attr_values(
            attrs2, bundles[0].attr(ch).code, new_pos[ci]
        )
    ev = evaluate(scene, attrs2, jnp.arange(F))
    np.testing.assert_allclose(
        np.asarray(ev.point_xy[0, 2]), np.asarray(ev.marker_xy[0, 2]),
        atol=1e-9,
    )


def test_set_camera_origin_frame():
    """tools/setcameraoriginframe: origin frame camera to identity,
    reprojection invariant, scene scaled."""
    sg, cam, bundles, _ = _tracked_scene()
    scene, attrs = sg.bake()
    ev_before = evaluate(scene, attrs, jnp.arange(F))

    originframe.set_camera_origin_frame(sg, cam, origin_frame_index=2,
                                        scene_scale=2.0)
    scene2, attrs2 = sg.bake()
    ev_after = evaluate(scene2, attrs2, jnp.arange(F))
    np.testing.assert_allclose(
        np.asarray(ev_after.point_xy), np.asarray(ev_before.point_xy),
        atol=1e-8,
    )
    cam_world2 = np.asarray(ev_after.tfm_world[cam.index, 2])
    np.testing.assert_allclose(cam_world2, np.eye(4), atol=1e-9)


def test_raycast_markers_onto_plane():
    """tools/raycastmarker: bundles land on the mesh plane under the
    marker rays."""
    sg = SceneGraph(frame_range=(1, 1))
    cam = sg.create_camera(
        "cam", ty=5.0, rx=-90.0, focal_length_mm=35.0,
        render_width=1920, render_height=1080,
    )  # looking straight down
    b0 = sg.create_bundle("b0")
    b1 = sg.create_bundle("b1")
    m0 = sg.create_marker("m0", camera=cam, bundle=b0, tx=0.05, ty=0.02)
    m1 = sg.create_marker("m1", camera=cam, bundle=b1, tx=-0.1, ty=0.0)
    # Ground plane y=0, big quad.
    vertices = np.array(
        [[-50, 0, -50], [50, 0, -50], [50, 0, 50], [-50, 0, 50]],
        np.float64,
    )
    triangles = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    hit = raycast.apply_raycast_bundles(sg, 0, vertices, triangles)
    assert np.all(np.asarray(hit))
    scene, attrs = sg.bake()
    ev = evaluate(scene, attrs, jnp.asarray([0]))
    pos = np.asarray(ev.bnd_world_point[:, 0])
    np.testing.assert_allclose(pos[:, 1], 0.0, atol=1e-9)  # on plane
    # And each bundle reprojects back onto its marker.
    np.testing.assert_allclose(
        np.asarray(ev.point_xy[:, 0]), np.asarray(ev.marker_xy[:, 0]),
        atol=1e-9,
    )
