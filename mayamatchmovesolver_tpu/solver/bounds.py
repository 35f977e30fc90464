"""Box-constraint reparameterization (sine transform).

Replicates the reference's parameter bound conversion
(ref: src/mmSolver/adjust/adjust_base.cpp:194-258, implementing the
MINPACK-style transformations of issue #64): solver-internal parameters
are unbounded; external attribute values respect [min, max].

    both bounds:  external = min + (max-min)/2 * (sin(internal) + 1)
    lower only:   external = min - 1 + sqrt(internal^2 + 1)
    upper only:   external = max + 1 - sqrt(internal^2 + 1)
    unbounded:    external = internal

Deviation from the reference, on purpose: (a) the reference's lower-only
branch has a sign slip (`xmin - (1 + sqrt(...))` at adjust_base.cpp:205)
that would always clamp to xmin — we use the standard formula; (b)
offset/scale are applied as exact inverses (internal = external*scale +
offset) where the reference's two directions are asymmetric
(adjust_base.cpp:218-219 vs 240-242).  Defaults offset=0/scale=1 match
the reference bit-for-bit.
"""

import jax.numpy as jnp

from mayamatchmovesolver_tpu.core.constants import FLOAT_MAX


def _bound_kinds(xmin, xmax):
    has_lower = xmin > -FLOAT_MAX
    has_upper = xmax < FLOAT_MAX
    return has_lower, has_upper


def external_to_internal(value, xmin, xmax, offset=0.0, scale=1.0):
    """Attribute value -> unbounded solver parameter (all array args)."""
    value = jnp.clip(value, xmin, xmax)
    v = value * scale + offset
    lo = xmin * scale + offset
    hi = xmax * scale + offset
    has_lower, has_upper = _bound_kinds(xmin, xmax)

    both = jnp.arcsin(
        jnp.clip(2.0 * (v - lo) / jnp.maximum(hi - lo, 1e-300) - 1.0, -1.0, 1.0)
    )
    lower_only = jnp.sqrt(jnp.maximum((v - lo + 1.0) ** 2 - 1.0, 0.0))
    upper_only = jnp.sqrt(jnp.maximum((hi - v + 1.0) ** 2 - 1.0, 0.0))

    return jnp.where(
        has_lower & has_upper,
        both,
        jnp.where(
            has_lower, lower_only, jnp.where(has_upper, upper_only, v)
        ),
    )


def internal_to_external(value, xmin, xmax, offset=0.0, scale=1.0):
    """Unbounded solver parameter -> attribute value (all array args)."""
    has_lower, has_upper = _bound_kinds(xmin, xmax)
    lo = xmin * scale + offset
    hi = xmax * scale + offset

    both = lo + (hi - lo) / 2.0 * (jnp.sin(value) + 1.0)
    lower_only = lo - 1.0 + jnp.sqrt(value * value + 1.0)
    upper_only = hi + 1.0 - jnp.sqrt(value * value + 1.0)

    v = jnp.where(
        has_lower & has_upper,
        both,
        jnp.where(
            has_lower, lower_only, jnp.where(has_upper, upper_only, value)
        ),
    )
    v = (v - offset) / scale
    return jnp.clip(v, xmin, xmax)
