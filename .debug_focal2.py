import numpy as np
import jax, jax.numpy as jnp
from mayamatchmovesolver_tpu.solver import ba, linalg
from mayamatchmovesolver_tpu.core import transform as tfm_math

rng = np.random.RandomState(3)
F, B = 12, 10
cam_true = np.zeros((F, 7), np.float32)
cam_true[:, 0] = np.linspace(-2, 2, F); cam_true[:, 1] = 1.0
cam_true[:, 2] = 10.0; cam_true[:, 4] = np.linspace(-5, 5, F)
cam_true[:, 6] = 40.0
bnd_true = np.stack([rng.uniform(-4, 4, B), rng.uniform(-2, 2, B),
                     rng.uniform(-8, -3, B)], -1).astype(np.float32)
p0 = ba.make_ba_problem(
    marker_uv=np.zeros((B, F, 2), np.float32),
    weight=np.ones((B, F), np.float32),
    mkr_bnd_index=np.arange(B),
    cam_params=cam_true, bnd_params=bnd_true,
    focal_length_mm=40.0, solve_focal=True)
r0, _, _ = ba._residual_and_blocks(p0, jnp.asarray(cam_true), jnp.asarray(bnd_true))
uv = -np.asarray(r0) / p0.image_width
cam0 = cam_true.copy(); cam0[:, 6] = 35.0
p = p0._replace(marker_uv=jnp.asarray(uv), cam_params=jnp.asarray(cam0))

r, j_cam, j_bnd = ba._residual_and_blocks(p, p.cam_params, p.bnd_params)
for name, x in [("r", r), ("j_cam", j_cam), ("j_bnd", j_bnd)]:
    x = np.asarray(x)
    print(name, x.shape, "finite:", np.all(np.isfinite(x)),
          "absmax: %.3e" % np.abs(x).max())
print("j_cam focal col absmax: %.3e" % np.abs(np.asarray(j_cam)[..., 6]).max())

mu = jnp.asarray(1e-3, jnp.float32)
b_blocks = jnp.einsum("mfra,mfrb->fab", j_cam, j_cam)
a_m = jnp.einsum("mfra,mfrb->mab", j_bnd, j_bnd)
a_blocks = jax.ops.segment_sum(a_m, p.mkr_bnd_index, num_segments=B)
print("b_blocks absmax %.3e finite %s" % (np.abs(np.asarray(b_blocks)).max(), np.all(np.isfinite(np.asarray(b_blocks)))))
d = jnp.maximum(jnp.diagonal(a_blocks, axis1=-2, axis2=-1), 1e-12)
a_damped = a_blocks + mu * d[..., None] * jnp.eye(3, dtype=jnp.float32)
a_inv = tfm_math.inverse3(a_damped)
print("a_inv absmax %.3e finite %s" % (np.abs(np.asarray(a_inv)).max(), np.all(np.isfinite(np.asarray(a_inv)))))
w_mf = jnp.einsum("mfra,mfrb->mfab", j_bnd, j_cam)
a_inv_m = a_inv[p.mkr_bnd_index]
y_mf = jnp.einsum("mab,mfbc->mfac", a_inv_m, w_mf)
s_cross = jnp.einsum("mfab,mgac->fbgc", w_mf, y_mf)
print("s_cross absmax %.3e finite %s" % (np.abs(np.asarray(s_cross)).max(), np.all(np.isfinite(np.asarray(s_cross)))))
db = jnp.maximum(jnp.diagonal(b_blocks, axis1=-2, axis2=-1), 1e-12)
b_damped = b_blocks + mu * db[..., None] * jnp.eye(7, dtype=jnp.float32)
s = -s_cross
idx = jnp.arange(F)
s = s.at[idx, :, idx, :].add(b_damped)
s_dense = s.reshape(F * 7, F * 7)
print("s_dense absmax %.3e finite %s" % (np.abs(np.asarray(s_dense)).max(), np.all(np.isfinite(np.asarray(s_dense)))))
diag = np.asarray(jnp.diagonal(s_dense))
print("s diag min %.3e max %.3e" % (diag.min(), diag.max()))
g_cam = jnp.einsum("mfra,mfr->fa", j_cam, r)
g_bnd_m = jnp.einsum("mfra,mfr->ma", j_bnd, r)
g_bnd = jax.ops.segment_sum(g_bnd_m, p.mkr_bnd_index, num_segments=B)
g_bnd_inv = jnp.einsum("mab,mb->ma", a_inv_m, g_bnd[p.mkr_bnd_index])
rhs = g_cam - jnp.einsum("mfab,ma->fb", w_mf, g_bnd_inv)
print("rhs finite %s absmax %.3e" % (np.all(np.isfinite(np.asarray(rhs))), np.abs(np.asarray(rhs)).max()))
x = linalg.solve_spd(s_dense, rhs.reshape(-1))
print("solve finite %s" % np.all(np.isfinite(np.asarray(x))))
l = linalg.cholesky(s_dense * 1.0)
print("chol finite %s" % np.all(np.isfinite(np.asarray(l))))
