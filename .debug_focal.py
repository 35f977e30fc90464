"""Debug: focal-solving BA on the axon TPU (f32) vs expectations."""
import numpy as np
import jax
import jax.numpy as jnp
from mayamatchmovesolver_tpu.solver import ba

print("backend:", jax.default_backend(), "x64:", jax.config.jax_enable_x64)

rng = np.random.RandomState(3)
F, B = 12, 10
cam_true = np.zeros((F, 7), np.float32)
cam_true[:, 0] = np.linspace(-2, 2, F)
cam_true[:, 1] = 1.0
cam_true[:, 2] = 10.0
cam_true[:, 4] = np.linspace(-5, 5, F)
cam_true[:, 6] = 40.0  # true focal
bnd_true = np.stack([rng.uniform(-4, 4, B), rng.uniform(-2, 2, B),
                     rng.uniform(-8, -3, B)], -1).astype(np.float32)
p0 = ba.make_ba_problem(
    marker_uv=np.zeros((B, F, 2), np.float32),
    weight=np.ones((B, F), np.float32),
    mkr_bnd_index=np.arange(B),
    cam_params=cam_true, bnd_params=bnd_true,
    focal_length_mm=40.0, solve_focal=True,
)
r, _, _ = ba._residual_and_blocks(p0, jnp.asarray(cam_true), jnp.asarray(bnd_true))
uv = -np.asarray(r) / p0.image_width

# Start: true poses/bundles but focal=35 (the drive's situation after SfM).
cam0 = cam_true.copy(); cam0[:, 6] = 35.0
p = p0._replace(marker_uv=jnp.asarray(uv), cam_params=jnp.asarray(cam0))
res = ba.solve_ba(p, max_iterations=30)
print("cost0=%.4e cost=%.4e iters=%d stop=%d" % (
    float(res.cost_initial), float(res.cost), int(res.iterations),
    int(res.stop_reason)))
print("focal out:", np.asarray(res.cam_params)[:3, 6])

# Single Schur step diagnostics at mu=1e-3
dx_cam, dx_bnd, cost, gnorm, da, db, gc, gb = ba._schur_normal_step(
    p, p.cam_params, p.bnd_params, jnp.asarray(1e-3, jnp.float32))
print("gnorm=%.3e cost=%.3e" % (float(gnorm), float(cost)))
print("dx_cam focal col:", np.asarray(dx_cam)[:3, 6])
print("dx finite:", bool(np.all(np.isfinite(np.asarray(dx_cam)))))
