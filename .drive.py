"""Verify drive: film-offset pan on real TPU + end-to-end solve incl.
an offset-attribute solve (lens_offset now observable -> solvable)."""

import numpy as np
import jax.numpy as jnp
import jax

print("backend:", jax.default_backend(), jax.devices())

import mayamatchmovesolver_tpu.api as mmapi
from mayamatchmovesolver_tpu.core.constants import FilmFit
from mayamatchmovesolver_tpu.scene import SceneGraph, evaluate
from mayamatchmovesolver_tpu.solver import SolverOptions, solve

# --- 1. film offset pans (the changed code path), on TPU ---
sg = SceneGraph(frame_range=(1, 1), dtype=np.float32)
cam = sg.create_camera(
    "cam", tz=10.0, focal_length_mm=35.0, sensor_width_mm=36.0,
    sensor_height_mm=24.0, lens_offset_x_mm=9.0,
    film_fit=FilmFit.HORIZONTAL, render_width=2048, render_height=1556,
)
b0 = sg.create_bundle("b0", tz=-10.0)
sg.create_marker("m0", camera=cam, bundle=b0)
scene, attrs = sg.bake()
out = evaluate(scene, attrs, jnp.asarray([0]))
got = np.asarray(out.point_xy[0, 0])
scale_x = (2048.0 / 1556.0) / (36.0 / 24.0)
want = np.array([-(9.0 / 36.0) * scale_x, 0.0])
print("pan got", got, "want", want)
assert np.allclose(got, want, atol=1e-5), (got, want)

# --- 2. solve the film offset back from marker evidence ---
sg2 = SceneGraph(frame_range=(1, 6), dtype=np.float32)
cam2 = sg2.create_camera(
    "cam", tz=10.0, tx=np.linspace(-1, 1, 6), focal_length_mm=35.0,
    lens_offset_x_mm=4.0, film_fit=FilmFit.HORIZONTAL,
    render_width=1920, render_height=1080,
)
rng = np.random.RandomState(0)
bs = [sg2.create_bundle("b%d" % i, tx=rng.uniform(-3, 3),
                        ty=rng.uniform(-2, 2), tz=rng.uniform(-9, -5))
      for i in range(6)]
for i, b in enumerate(bs):
    sg2.create_marker("m%d" % i, camera=cam2, bundle=b,
                      tx=np.zeros(6), ty=np.zeros(6))
scene2, attrs2 = sg2.bake()
ev = evaluate(scene2, attrs2, jnp.arange(6))
from mayamatchmovesolver_tpu.scene.flatscene import set_marker_screen_positions
attrs2 = set_marker_screen_positions(scene2, attrs2, jnp.arange(6), ev.point_xy)
# Perturb offset, solve it back.
static = np.array(attrs2.static_values)
off_attr = cam2.attr("lens_offset_x_mm")
static[off_attr.code // 2] = 0.0   # start from no pan
attrs2 = attrs2._replace(static_values=jnp.asarray(static))
new_attrs, result = solve(
    scene2, attrs2, np.arange(6), [off_attr],
    SolverOptions(image_width=1920.0, iterations=20),
)
solved = float(np.asarray(new_attrs.static_values)[off_attr.code // 2])
print("\n".join(result.as_key_value_strings()[:4]))
print("solved lens_offset_x_mm:", solved, "(true 4.0)")
assert result.success and abs(solved - 4.0) < 1e-2, (result.success, solved)

# --- 3. protocol sanity: empty collection fails validation cleanly ---
col = mmapi.Collection(scene_graph=sg2)
_, res = mmapi.execute(col)
print("empty collection ->", res[0].success, "|", res[0].reason_string)
assert res[0].success is False

print("VERIFY-OK")
