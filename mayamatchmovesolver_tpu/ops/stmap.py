"""Lens distortion ST-map generation — Pallas TPU kernel.

Replaces the reference's rayon-parallel per-scanline image distortion
engine (ref: lib/cppbind/mmlens/src/distortion_process.rs:26-70 and the
tools/lensdistortion CLI): for every pixel of the output image, compute
where it samples in the input (distort or undistort), producing an
RGBA float32 ST-map (R=S, G=T, B=0, A=1).

The Pallas kernel tiles the image into (TILE_H, TILE_W) VMEM blocks;
each block derives its pixel coordinates from the grid position with
broadcasted_iota (no coordinate tensor ever hits HBM), runs the lens
polynomial (and its fixed-point inverse for the distort direction)
entirely in registers/VMEM, and writes the two coordinate planes.
A pure-XLA fallback covers every model type and doubles as the oracle.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mayamatchmovesolver_tpu.models import base as lens_base
from mayamatchmovesolver_tpu.models import tde

TILE_H = 8
TILE_W = 128


def stmap_xla(model, film_back, width, height, direction="distort",
              dtype=jnp.float32):
    """Whole-image ST map via plain XLA (any model type).

    Pixel centers sample at (x+0.5)/w, (y+0.5)/h in unit space, like
    the reference's image loops (ref: distortion_process.rs per-pixel
    identity coordinates).  Returns (H, W, 4) float32.
    """
    ys = (jnp.arange(height, dtype=dtype) + 0.5) / height
    xs = (jnp.arange(width, dtype=dtype) + 0.5) / width
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")
    pts_marker = jnp.stack([grid_x - 0.5, grid_y - 0.5], axis=-1)
    if direction == "distort":
        out = tde.distort(model, film_back, pts_marker)
    else:
        out = tde.undistort(model, film_back, pts_marker)
    out_unit = out + 0.5
    rgba = jnp.concatenate(
        [
            out_unit,
            jnp.zeros_like(out_unit[..., :1]),
            jnp.ones_like(out_unit[..., :1]),
        ],
        axis=-1,
    )
    return rgba.astype(jnp.float32)


def _classic_undistort_tile(params, x, y):
    """TdeClassic undistort on coordinate tiles (same math as
    models/tde.py, expressed on separate x/y planes)."""
    ld, sq, cx, cy, qu = params
    cxx = ld / sq
    cxy = (ld + cx) / sq
    cyx = ld + cy
    cyy = ld
    qs = qu / sq
    x2, y2 = x * x, y * y
    x4, y4 = x2 * x2, y2 * y2
    xy2 = x2 * y2
    qx = x * (1.0 + cxx * x2 + cxy * y2 + qs * x4 + 2.0 * qs * xy2
              + qs * y4)
    qy = y * (1.0 + cyx * x2 + cyy * y2 + qu * x4 + 2.0 * qu * xy2
              + qu * y4)
    return qx, qy


def _stmap_classic_kernel(out_s_ref, out_t_ref, *, width, height,
                          distort, inverse_iterations, lens_params,
                          film_back):
    """One (TILE_H, TILE_W) block of the ST map.

    Lens/camera parameters are compile-time constants (an ST-map export
    is one-shot per parameter set, so recompiles are free and the whole
    polynomial constant-folds into the kernel).
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    row0 = (i * TILE_H).astype(jnp.float32)
    col0 = (j * TILE_W).astype(jnp.float32)

    # iota must be integer-typed on TPU; cast afterwards.
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (TILE_H, TILE_W), 0
    ).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(
        jnp.int32, (TILE_H, TILE_W), 1
    ).astype(jnp.float32)
    y_unit = (rows + row0 + 0.5) / height
    x_unit = (cols + col0 + 0.5) / width

    # unit -> diagonally normalized (film back + lens center offset).
    fbw, fbh, lcox, lcoy = film_back
    radius = (fbw * fbw + fbh * fbh) ** 0.5 * 0.5
    x_dn = ((x_unit - 0.5) * fbw - lcox) / radius
    y_dn = ((y_unit - 0.5) * fbh - lcoy) / radius

    params = lens_params

    if distort:
        # Fixed-point inverse of the undistort polynomial.
        ux, uy = _classic_undistort_tile(params, x_dn, y_dn)
        px = x_dn - (ux - x_dn)
        py = y_dn - (uy - y_dn)

        def body(_, carry):
            px, py = carry
            fx, fy = _classic_undistort_tile(params, px, py)
            return (px + (x_dn - fx), py + (y_dn - fy))

        px, py = jax.lax.fori_loop(
            0, inverse_iterations, body, (px, py)
        )
        out_x, out_y = px, py
    else:
        out_x, out_y = _classic_undistort_tile(params, x_dn, y_dn)

    # dn -> unit.
    s = (out_x * radius + fbw * 0.5 + lcox) / fbw
    t = (out_y * radius + fbh * 0.5 + lcoy) / fbh
    out_s_ref[:, :] = s
    out_t_ref[:, :] = t


def stmap_classic_pallas(model: tde.TdeClassic,
                         film_back: lens_base.FilmBack,
                         width, height, direction="distort",
                         inverse_iterations=20):
    """Pallas ST map for the 3DE classic model; returns (H, W, 4)."""
    height_pad = -(-height // TILE_H) * TILE_H
    width_pad = -(-width // TILE_W) * TILE_W

    kernel = functools.partial(
        _stmap_classic_kernel,
        width=float(width),
        height=float(height),
        distort=(direction == "distort"),
        inverse_iterations=inverse_iterations,
        lens_params=(
            float(model.distortion),
            float(model.anamorphic_squeeze),
            float(model.curvature_x),
            float(model.curvature_y),
            float(model.quartic_distortion),
        ),
        film_back=(
            float(film_back.film_back_width_cm),
            float(film_back.film_back_height_cm),
            float(film_back.lens_center_offset_x_cm),
            float(film_back.lens_center_offset_y_cm),
        ),
    )
    grid = (height_pad // TILE_H, width_pad // TILE_W)
    s, t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[],
        out_specs=(
            pl.BlockSpec(
                (TILE_H, TILE_W), lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (TILE_H, TILE_W), lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((height_pad, width_pad), jnp.float32),
            jax.ShapeDtypeStruct((height_pad, width_pad), jnp.float32),
        ),
    )()
    s = s[:height, :width]
    t = t[:height, :width]
    return jnp.stack(
        [s, t, jnp.zeros_like(s), jnp.ones_like(s)], axis=-1
    )


def stmap(model, film_back, width, height, direction="distort",
          use_pallas=True):
    """Dispatch: Pallas fast path for supported models, XLA otherwise."""
    if use_pallas and isinstance(model, tde.TdeClassic):
        try:
            return stmap_classic_pallas(
                model, film_back, width, height, direction
            )
        except Exception:  # pragma: no cover - fallback on any lowering gap
            pass
    return stmap_xla(model, film_back, width, height, direction)
