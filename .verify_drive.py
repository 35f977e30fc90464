"""Verification drive: end-to-end matchmove solve through the public API."""
import numpy as np
import mayamatchmovesolver_tpu.api as mmapi
from mayamatchmovesolver_tpu.core.constants import FilmFit

# --- Build a 12-frame shot: animated camera, 8 bundles. -------------
n = 12
sg = mmapi.SceneGraph(frame_range=(1, n))
cam = sg.create_camera(
    "cam", tx=np.linspace(-1, 1, n), ty=1.0, tz=10.0,
    ry=np.linspace(-5, 5, n),
    focal_length_mm=35.0, film_fit=FilmFit.HORIZONTAL,
    render_width=1920, render_height=1080,
)
rng = np.random.RandomState(1)
bundles = [sg.create_bundle("b%d" % i, tx=rng.uniform(-3,3),
                            ty=rng.uniform(-1,2), tz=rng.uniform(-8,-4))
           for i in range(8)]
markers = [sg.create_marker("m%d" % i, camera=cam, bundle=b,
                            tx=np.zeros(n), ty=np.zeros(n))
           for i, b in enumerate(bundles)]

# Ground-truth tracks from the engine itself, then perturb bundles.
import jax.numpy as jnp
from mayamatchmovesolver_tpu.scene import evaluate
scene, attrs = sg.bake()
ev = evaluate(scene, attrs, jnp.arange(n))
anim = np.array(attrs.anim_values)
for i, m in enumerate(markers):
    anim[m.attr("tx").code // 2] = np.asarray(ev.point_xy)[i, :, 0]
    anim[m.attr("ty").code // 2] = np.asarray(ev.point_xy)[i, :, 1]
attrs = attrs._replace(anim_values=jnp.asarray(anim))
static = np.array(attrs.static_values)
for b in bundles:
    static[b.attr("tx").code // 2] += 0.4
    static[b.attr("ty").code // 2] -= 0.3
attrs = attrs._replace(static_values=jnp.asarray(static))

# --- Solve through the public solve API. ----------------------------
from mayamatchmovesolver_tpu.solver import SolverOptions, solve
solve_attrs = [b.attr(c) for b in bundles for c in ("tx", "ty")]
opts = SolverOptions(iterations=50, image_width=1920.0)
new_attrs, result = solve(scene, attrs, list(range(n)), solve_attrs, opts)
print("== solve result (key=value strings, mmSolver protocol):")
for line in result.as_key_value_strings()[:10]:
    print("  ", line)
print("  evals/sec:", round(result.evals_per_second, 1))
b0 = bundles[0]
print("  solved b0 tx err:",
      abs(float(new_attrs.static_values[b0.attr('tx').code//2])
          - (static[b0.attr('tx').code//2] - 0.4)))

# --- Probe 1: empty collection -> clean failure. --------------------
col = mmapi.Collection(sg)
_, results = mmapi.execute(col)
print("== probe empty collection: success=%s reason=%r"
      % (results[0].success, results[0].reason_string))

# --- Probe 2: more parameters than errors -> refusal. ---------------
one_mkr_sg = mmapi.SceneGraph(frame_range=(1, 1))
c2 = one_mkr_sg.create_camera("cam", tz=10.0)
b2 = one_mkr_sg.create_bundle("b", tz=-5.0)
one_mkr_sg.create_marker("m", camera=c2, bundle=b2)
s2, a2 = one_mkr_sg.bake()
_, r2 = solve(s2, a2, [0], [b2.attr("tx"), b2.attr("ty"), b2.attr("tz")],
              SolverOptions())
print("== probe underdetermined: success=%s reason=%r"
      % (r2.success, r2.reason_string))

# --- Probe 3: full Collection workflow with SolverStandard. ---------
col = mmapi.Collection(sg)
col.add_marker(*markers)
col.add_attribute(*[b.attr("tx") for b in bundles])
col.set_solver(mmapi.SolverStandard(frame_indices=list(range(n)),
                                    root_frame_indices=[0, n - 1]))
new_attrs2, results2 = mmapi.execute(
    col, options=SolverOptions(iterations=30, image_width=1920.0))
print("== collection execute: %d passes, final error %.6f px"
      % (len(results2), results2[-1].error_final))
