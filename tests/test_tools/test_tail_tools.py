"""Tests for the L8 tail tool data capabilities: attach-bundle-to-curve,
deform-marker, subdivide-line, copy/paste-marker, surface-cluster/rivet
(ref tool packages: python/mmSolver/tools/<name>/lib.py)."""

import numpy as np

import mayamatchmovesolver_tpu.api as mmapi
from mayamatchmovesolver_tpu.tools import (
    copypastemarker,
    curves,
    deformmarker,
    subdivideline,
    surfacecluster,
)

N_FRAMES = 6


def _scene_with_line(lens_distortion=None):
    sg = mmapi.SceneGraph(frame_range=(1, N_FRAMES))
    cam = sg.create_camera(
        "cam", tz=10.0, render_width=1920, render_height=1080
    )
    lens = None
    if lens_distortion is not None:
        from mayamatchmovesolver_tpu.models import scenelens

        scenelens.attach_lens(
            sg, cam, scenelens.LENS_MODEL_CLASSIC,
            distortion=lens_distortion,
        )
        lens = scenelens.bake_scene_lens(sg)
    markers = []
    for i in range(3):
        bnd = sg.create_bundle("b%d" % i, tx=float(i) - 1.0, tz=-5.0)
        markers.append(sg.create_marker(
            "m%d" % i, camera=cam, bundle=bnd,
            tx=np.linspace(-0.2 + 0.1 * i, 0.1 * i, N_FRAMES),
            ty=np.full(N_FRAMES, 0.05 * i),
        ))
    line = sg.create_line("line0", markers)
    return sg, cam, markers, line, lens


# ---- attachbundletocurve ------------------------------------------------


def test_curve_point_interpolates_endpoints():
    ctrl = np.array([[0, 0, 0], [1, 2, 0], [2, -1, 0], [3, 0, 0]],
                    float)
    p0 = curves.curve_point(ctrl, 0.0)
    p1 = curves.curve_point(ctrl, 1.0)
    np.testing.assert_allclose(p0, ctrl[0], atol=1e-9)
    np.testing.assert_allclose(p1, ctrl[-1], atol=1e-9)


def test_closest_point_on_curve_straight_line():
    # A degree-1 polyline along X: the closest point to (x, y, 0) is
    # (x, 0, 0), param x/3 (chord-uniform on a straight line).
    ctrl = np.array([[0, 0, 0], [3, 0, 0]], float)
    point, t, dist = curves.closest_point_on_curve(
        ctrl, np.array([1.2, 0.7, 0.0]), degree=1
    )
    np.testing.assert_allclose(point, [1.2, 0.0, 0.0], atol=1e-4)
    np.testing.assert_allclose(t, 0.4, atol=1e-4)
    np.testing.assert_allclose(dist, 0.7, atol=1e-6)


def test_attach_bundle_to_curve_moves_bundle():
    sg, cam, markers, line, _ = _scene_with_line()
    bnd = markers[0].bundle
    ctrl = np.array(
        [[-2, 0, -5], [0, 1, -5], [2, 0, -5]], float
    )
    t, point = curves.attach_bundle_to_curve(sg, bnd, ctrl, degree=2)
    assert 0.0 <= t <= 1.0
    got = [float(sg.get_value(bnd.attr(c))) for c in ("tx", "ty", "tz")]
    np.testing.assert_allclose(got, point, atol=1e-12)
    # Driving the param moves the bundle along the curve.
    p2 = curves.move_bundle_along_curve(sg, bnd, ctrl, 0.0, degree=2)
    np.testing.assert_allclose(p2, ctrl[0], atol=1e-9)


# ---- deformmarker -------------------------------------------------------


def test_deform_markers_roundtrip():
    """Apply + remove is identity to fixed-point-inverse tolerance
    (ref: deformmarker apply/remove modes)."""
    sg, cam, markers, line, lens = _scene_with_line(
        lens_distortion=0.15
    )
    scene, attrs = sg.bake()
    fi = np.arange(N_FRAMES)
    deformed = deformmarker.deform_markers(
        scene, attrs, lens, fi, direction="distort"
    )
    # The deform moved the markers...
    assert not np.allclose(
        np.asarray(deformed.anim_values), np.asarray(attrs.anim_values)
    )
    # ...and the inverse recovers them.
    restored = deformmarker.remove_marker_deform(
        scene, deformed, lens, fi
    )
    np.testing.assert_allclose(
        np.asarray(restored.anim_values),
        np.asarray(attrs.anim_values),
        atol=1e-6,
    )


# ---- subdivideline ------------------------------------------------------


def test_subdivide_line_inserts_midpoints():
    sg, cam, markers, line, _ = _scene_with_line()
    new_line, all_markers, new_markers = subdivideline.subdivide_line(
        sg, line
    )
    # 3 members -> 2 segments -> 2 new markers, interleaved.
    assert len(new_markers) == 2
    assert len(all_markers) == 5
    assert all_markers[0] is markers[0]
    assert all_markers[1] is new_markers[0]
    assert all_markers[2] is markers[1]
    # Midpoint values on every frame.
    for f in range(N_FRAMES):
        a = sg.get_value(markers[0].attr("tx"), frame=f)
        b = sg.get_value(markers[1].attr("tx"), frame=f)
        mid = sg.get_value(new_markers[0].attr("tx"), frame=f)
        np.testing.assert_allclose(mid, 0.5 * (a + b), atol=1e-12)
    # Bundle midway.
    bx = float(sg.get_value(new_markers[0].bundle.attr("tx")))
    np.testing.assert_allclose(bx, -0.5, atol=1e-12)
    # The new line owns the interleaved members and the scene bakes.
    assert new_line.markers == all_markers
    sg.bake()


# ---- copypastemarker + uvtrack writer versions --------------------------


def test_copy_paste_marker_roundtrip(tmp_path):
    sg, cam, markers, line, _ = _scene_with_line()
    text = copypastemarker.copy_markers_to_string(
        sg, markers[:2], version=3
    )
    assert '"version": 3' in text

    sg2 = mmapi.SceneGraph(frame_range=(1, N_FRAMES))
    cam2 = sg2.create_camera("cam", tz=10.0, render_width=1920,
                             render_height=1080)
    created = copypastemarker.paste_markers(sg2, cam2, text)
    assert len(created) == 2
    for (mkr2, bnd2), mkr in zip(created, markers[:2]):
        for f in range(N_FRAMES):
            np.testing.assert_allclose(
                sg2.get_value(mkr2.attr("tx"), frame=f),
                sg.get_value(mkr.attr("tx"), frame=f),
                atol=1e-9,
            )
        np.testing.assert_allclose(
            float(sg2.get_value(bnd2.attr("tx"))),
            float(sg.get_value(mkr.bundle.attr("tx"))),
            atol=1e-9,
        )


def test_uvtrack_writer_versions(tmp_path):
    import json

    from mayamatchmovesolver_tpu.io import uvtrack

    sg, cam, markers, line, _ = _scene_with_line()
    md = [copypastemarker.marker_to_marker_data(sg, m)
          for m in markers]
    for version in (1, 2, 3, 4):
        path = str(tmp_path / ("t%d.uv" % version))
        uvtrack.write(path, md, version=version)
        assert uvtrack.determine_format_version(path) == (
            version if version > 1 else 1
        )
        _, parsed = uvtrack.parse(path)
        assert len(parsed) == len(md)
        f0 = md[0].x.get_times()[0]
        np.testing.assert_allclose(
            parsed[0].x.get_value(f0), md[0].x.get_value(f0),
            atol=1e-9,
        )
        if version >= 2:
            with open(path) as f:
                data = json.load(f)
            assert data["version"] == version
            assert data["num_points"] == len(md)
        if version >= 3:
            assert parsed[0].bundle_x is not None


# ---- surfacecluster / rivet ---------------------------------------------


def _quad_mesh():
    vertices = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], float
    )
    triangles = np.array([[0, 1, 2], [0, 2, 3]], int)
    return vertices, triangles


def test_closest_point_on_triangles_inside_and_edge():
    v, t = _quad_mesh()
    point, ti, bary = surfacecluster.closest_point_on_triangles(
        v, t, np.array([0.75, 0.25, 0.5])
    )
    np.testing.assert_allclose(point, [0.75, 0.25, 0.0], atol=1e-9)
    assert ti == 0
    # Outside the mesh: clamps to the nearest edge point.
    point, ti, bary = surfacecluster.closest_point_on_triangles(
        v, t, np.array([2.0, 0.5, 0.0])
    )
    np.testing.assert_allclose(point, [1.0, 0.5, 0.0], atol=1e-9)
    np.testing.assert_allclose(np.sum(bary), 1.0, atol=1e-9)


def test_rivet_follows_animated_mesh():
    v, t = _quad_mesh()
    # Animate: translate the whole mesh in z over 3 frames.
    anim = np.stack([v + [0, 0, z] for z in (0.0, 1.0, 2.0)])
    _, ti, bary = surfacecluster.closest_point_on_triangles(
        v, t, np.array([0.5, 0.25, 0.0])
    )
    frames = surfacecluster.rivet_frames(anim, t, ti, bary)
    np.testing.assert_allclose(
        frames["position"][:, 2], [0.0, 1.0, 2.0], atol=1e-9
    )
    np.testing.assert_allclose(
        frames["normal"], np.tile([0, 0, 1.0], (3, 1)), atol=1e-9
    )
    # The matrix is a rigid frame at the point.
    m = frames["matrix"][1]
    np.testing.assert_allclose(m[:3, 3], frames["position"][1])
    np.testing.assert_allclose(m[:3, :3] @ m[:3, :3].T, np.eye(3),
                               atol=1e-9)


def test_two_edge_rivet():
    v, t = _quad_mesh()
    out = surfacecluster.two_edge_rivet(v, (0, 1), (3, 2))
    np.testing.assert_allclose(out["position"], [0.5, 0.5, 0.0],
                               atol=1e-9)
    np.testing.assert_allclose(np.abs(out["normal"]), [0, 0, 1.0],
                               atol=1e-9)


def test_surface_cluster_deform_follows_surface():
    v, t = _quad_mesh()
    cluster = surfacecluster.create_surface_cluster(
        v, t, component_index=2, falloff_radius=1.0
    )
    assert cluster["weights"][2] == 1.0
    assert cluster["weights"][0] == 0.0  # distance sqrt(2) > radius
    # Push along the rivet normal (z): the weighted vertices move in z.
    out = surfacecluster.apply_surface_cluster(
        cluster, v, t, control_delta=np.array([0.0, 0.5, 0.0])
    )
    assert out[2, 2] != 0.0
    np.testing.assert_allclose(out[0], v[0], atol=1e-12)
    # Animated mesh: the deform follows the moving surface frame.
    anim = np.stack([v, v + [0, 0, 1.0]])
    out_anim = surfacecluster.apply_surface_cluster(
        cluster, anim, t, control_delta=np.array([0.0, 0.5, 0.0])
    )
    np.testing.assert_allclose(
        out_anim[1, 2] - out_anim[0, 2], [0, 0, 1.0], atol=1e-9
    )


# ---- link/unlink, lock toggles, camera aim ------------------------------


def test_link_and_unlink_marker_bundle():
    from mayamatchmovesolver_tpu.tools import markertools

    sg, cam, markers, line, _ = _scene_with_line()
    other = sg.create_bundle("other", tx=2.0, tz=-6.0)
    markertools.link_marker_bundle(markers[0], other)
    assert markers[0].bundle is other
    scene, attrs = sg.bake()
    assert int(scene.mkr_bnd_index[0]) == other.bnd_index

    fresh = markertools.unlink_marker_bundle(markers[1], sg)
    assert markers[1].bundle is fresh
    # New bundle starts at the old bundle's position.
    assert float(sg.get_value(fresh.attr("tx"))) == 0.0


def test_toggle_locks():
    from mayamatchmovesolver_tpu.tools import markertools

    sg, cam, markers, line, _ = _scene_with_line()
    bundles = [m.bundle for m in markers]
    assert markertools.toggle_bundle_lock(bundles) is True
    assert all(b.attr("tx").is_locked() for b in bundles)
    assert markertools.toggle_bundle_lock(bundles) is False
    assert not any(b.attr("tz").is_locked() for b in bundles)
    # Mixed state locks everything first.
    bundles[0].attr("tx").lock()
    assert markertools.toggle_bundle_lock(bundles) is True
    assert markertools.toggle_marker_lock(markers) is True
    assert markers[0].attr("tx").is_locked()


def test_aim_at_target_points_camera():
    """After aiming, the transform's -Z axis (through the engine's own
    rotation convention) points at the target."""
    import jax.numpy as jnp

    from mayamatchmovesolver_tpu.core import transform as tfm
    from mayamatchmovesolver_tpu.tools import markertools

    sg, cam, markers, line, _ = _scene_with_line()
    tgt = np.array([3.0, 1.0, -4.0])
    (angles,) = markertools.aim_at_target(sg, [cam], tgt)
    r = np.asarray(tfm.euler_to_rotation_matrix(
        jnp.asarray(angles[0]),
        jnp.asarray(angles[1]),
        jnp.asarray(angles[2]),
        jnp.asarray(0, jnp.int32),  # XYZ (degrees)
    ))
    fwd = -r[:, 2]  # camera looks down local -Z
    pos = np.array([
        float(sg.get_value(cam.attr(ch))) for ch in ("tx", "ty", "tz")
    ])
    want = tgt - pos
    want = want / np.linalg.norm(want)
    np.testing.assert_allclose(fwd, want, atol=1e-9)
    # Up vector stays world-up-ish (no roll).
    assert r[1, 1] > 0.5
