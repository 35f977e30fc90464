"""Image warping: apply an ST map (or a lens model directly) to pixels.

The reference generates ST maps for compositors to warp plates with
(ref: tools/lensdistortion writes the maps; the actual resample happens
in Nuke's STMap node / the image-plane pipeline).  This module closes
that loop natively: a batched bilinear resample driven by an ST map or
by a 3DE lens model, jit-compiled — the gather-heavy memory-bound
companion of the compute-bound ST-map kernels (ops/stmap.py).

Conventions match the ST maps this framework writes: an ST map pixel
(s, t) holds the [0, 1] UV of the SOURCE sample for that destination
pixel, v up, pixel centers at half-integers.
"""

import jax
import jax.numpy as jnp


def _bilinear_sample(image, u, v):
    """Sample image (H, W, C) at continuous UV in [0, 1] (v up), edge
    clamped; u/v may have any broadcastable shape."""
    h, w = image.shape[0], image.shape[1]
    # UV -> continuous pixel coords (pixel centers at half-integers;
    # v up -> row 0 is the TOP of the image, so flip).
    x = u * w - 0.5
    y = (1.0 - v) * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    top = (
        image[y0i, x0i] * (1.0 - fx)[..., None]
        + image[y0i, x1i] * fx[..., None]
    )
    bottom = (
        image[y1i, x0i] * (1.0 - fx)[..., None]
        + image[y1i, x1i] * fx[..., None]
    )
    return top * (1.0 - fy)[..., None] + bottom * fy[..., None]


@jax.jit
def warp_image(image, stmap):
    """Resample image through an ST map (the compositor STMap-node
    semantics the reference's maps are produced for).

    image: (H, W, C) float; stmap: (H', W', >=2) — channels 0/1 are the
    source UV per destination pixel.  Returns (H', W', C)."""
    image = jnp.asarray(image)
    stmap = jnp.asarray(stmap)
    return _bilinear_sample(image, stmap[..., 0], stmap[..., 1])


def warp_image_with_lens(image, model, film_back, direction="distort",
                         out_width=None, out_height=None):
    """Warp pixels directly through a lens model: generates the ST map
    (ops/stmap.py XLA path — fused by jit with the resample) and
    samples the image through it.

    direction='distort' produces the distorted (through-the-lens)
    image from an undistorted source; 'undistort' removes distortion
    from a scanned plate."""
    from mayamatchmovesolver_tpu.ops import stmap as stmap_mod

    h = int(out_height or image.shape[0])
    w = int(out_width or image.shape[1])
    st = stmap_mod.stmap_xla(model, film_back, w, h,
                             direction=direction)
    return warp_image(jnp.asarray(image), st)
