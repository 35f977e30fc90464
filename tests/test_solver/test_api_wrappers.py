"""Frame/Lens OO wrappers + SolverTriangulate strategy
(ref: python/mmSolver/_api/frame.py, lens.py, solvertriangulate.py)."""

import numpy as np

import mayamatchmovesolver_tpu.api as mmapi
from mayamatchmovesolver_tpu.core.constants import FilmFit
from mayamatchmovesolver_tpu.models import scenelens
from mayamatchmovesolver_tpu.scene import SceneGraph


def test_frame_wrapper():
    f = mmapi.Frame(12, primary=True)
    assert f.get_number() == 12 and int(f) == 12
    assert f.primary and not f.secondary
    assert "primary" in f.get_tags()
    # Solver classes accept Frame objects.
    s = mmapi.SolverStep(frame_indices=[mmapi.Frame(3), 4, mmapi.Frame(5)])
    assert s.frame_indices == [3, 4, 5]


def test_lens_wrapper():
    sg = SceneGraph(frame_range=(1, 2))
    cam = sg.create_camera("cam", tz=10.0)
    scenelens.attach_lens(sg, cam, scenelens.LENS_MODEL_CLASSIC,
                          distortion=0.1)
    scenelens.attach_lens(sg, cam, scenelens.LENS_MODEL_RADIAL_DEG4)
    assert mmapi.Lens.layer_count(cam) == 2
    lens0 = mmapi.Lens(cam, 0)
    assert lens0.model_type == scenelens.LENS_MODEL_CLASSIC
    a = lens0.attr("distortion")
    assert a.code >= 0
    assert a in lens0.get_attribute_list()
    lens1 = mmapi.Lens(cam, 1)
    assert lens1.model_type == scenelens.LENS_MODEL_RADIAL_DEG4
    assert "degree2_distortion" in lens1.parameter_names


def _tracked_scene(num_frames=10, num_bundles=6):
    """Marker tracks are written into the SCENE GRAPH (not just the
    attr block) so Collection re-bakes see them too."""
    import jax.numpy as jnp

    from mayamatchmovesolver_tpu.scene import evaluate, flatscene

    rng = np.random.RandomState(5)
    cam_kwargs = dict(
        tx=np.linspace(-2, 2, num_frames),
        ty=np.zeros(num_frames),
        tz=np.full(num_frames, 10.0),
        ry=np.linspace(-6, 6, num_frames),
        focal_length_mm=35.0, film_fit=FilmFit.HORIZONTAL,
        render_width=1920, render_height=1080,
    )
    gt = np.stack([
        rng.uniform(-3, 3, num_bundles),
        rng.uniform(-2, 2, num_bundles),
        rng.uniform(-6, -2, num_bundles),
    ], axis=-1)

    def build(marker_raw=None):
        sg = SceneGraph(frame_range=(1, num_frames))
        cam = sg.create_camera("cam", **cam_kwargs)
        bundles = [
            sg.create_bundle("b%d" % i, tx=gt[i, 0], ty=gt[i, 1],
                             tz=gt[i, 2])
            for i in range(num_bundles)
        ]
        markers = [
            sg.create_marker(
                "m%d" % i, camera=cam, bundle=b,
                tx=(np.zeros(num_frames) if marker_raw is None
                    else marker_raw[i, :, 0]),
                ty=(np.zeros(num_frames) if marker_raw is None
                    else marker_raw[i, :, 1]),
            )
            for i, b in enumerate(bundles)
        ]
        return sg, cam, bundles, markers

    # Pass 1: ground-truth projections -> raw marker channel values.
    sg0, _, _, _ = build()
    scene0, attrs0 = sg0.bake()
    ev = evaluate(scene0, attrs0, jnp.arange(num_frames))
    fsx, fsy = flatscene.marker_fit_scale(
        scene0, attrs0, jnp.arange(num_frames)
    )
    pt = np.array(ev.point_xy)
    marker_raw = np.stack(
        [pt[..., 0] / np.asarray(fsx), pt[..., 1] / np.asarray(fsy)],
        axis=-1,
    )
    # Pass 2: the real scene with tracks baked into the graph.
    sg, cam, bundles, markers = build(marker_raw)
    scene, attrs = sg.bake()
    return sg, scene, attrs, cam, bundles, markers, gt


def test_solver_triangulate_recovers_bundles():
    sg, scene, attrs, cam, bundles, markers, gt = _tracked_scene()
    import jax.numpy as jnp

    # Scramble bundle positions; triangulation must recover them from
    # the (exact) tracks + known camera.
    static = np.array(attrs.static_values)
    for b in bundles:
        for c in ("tx", "ty", "tz"):
            static[b.attr(c).code // 2] = 0.0
    attrs = attrs._replace(static_values=jnp.asarray(static))

    strategy = mmapi.SolverTriangulate(frame_indices=range(10))
    attrs_out, results = strategy.execute(scene, attrs, [])
    assert results[-1].success, results[-1].reason_string
    solved = np.stack([
        [float(np.asarray(attrs_out.static_values)[b.attr(c).code // 2])
         for c in ("tx", "ty", "tz")]
        for b in bundles
    ])
    np.testing.assert_allclose(solved, gt, atol=1e-5)
    assert results[-1].error_final < 1e-4


def test_solver_triangulate_through_collection():
    sg, scene, attrs, cam, bundles, markers, gt = _tracked_scene()
    col = mmapi.Collection(sg)
    col.add_marker(*markers)
    col.set_solver(mmapi.SolverTriangulate(frame_indices=range(10)))
    attrs_out, results = mmapi.execute(col)
    assert results[-1].success
    assert results[-1].error_final < 1e-4
