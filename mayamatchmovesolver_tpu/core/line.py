"""2D line fitting and intersection math.

Re-implementation of the reference's line math used by the
mmLineBestFit / mmLineIntersect / mmLinePointIntersect nodes
(ref: lib/rust/mmscenegraph/src/math/line.rs:90-272,
line_intersect.rs:42, and the node wrappers
src/mmSolver/node/MMLineBestFitNode.cpp:94).
"""

import jax.numpy as jnp


def fit_line_to_points(x, y):
    """Total-least-squares line fit through 2D points.

    Returns (point_x, point_y, dir_x, dir_y): a point on the line (the
    centroid) and the unit direction.  Uses the orthogonal-regression
    eigen direction of the 2x2 scatter matrix, which matches the
    reference's slope fits (line.rs fit_line_to_points_type1/2) without
    their vertical/horizontal special-casing.
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    mean_x = jnp.mean(x, axis=-1)
    mean_y = jnp.mean(y, axis=-1)
    dx = x - mean_x[..., None]
    dy = y - mean_y[..., None]
    sxx = jnp.sum(dx * dx, axis=-1)
    syy = jnp.sum(dy * dy, axis=-1)
    sxy = jnp.sum(dx * dy, axis=-1)
    # Principal eigenvector of [[sxx, sxy], [sxy, syy]].
    theta = 0.5 * jnp.arctan2(2.0 * sxy, sxx - syy)
    dir_x = jnp.cos(theta)
    dir_y = jnp.sin(theta)
    return mean_x, mean_y, dir_x, dir_y


def line_point_intersection(point, line_a, line_b):
    """Closest point on segment-line (line_a, line_b) to `point`.

    (ref: line_intersect.rs:42 line_point_intersection.)
    All args (..., 2); returns (..., 2).
    """
    point = jnp.asarray(point)
    line_a = jnp.asarray(line_a)
    line_b = jnp.asarray(line_b)
    d = line_b - line_a
    denom = jnp.sum(d * d, axis=-1, keepdims=True)
    t = jnp.sum((point - line_a) * d, axis=-1, keepdims=True) / jnp.maximum(
        denom, 1e-30
    )
    return line_a + t * d


def line_line_intersection(p1, d1, p2, d2):
    """Intersection of two infinite 2D lines (point+direction form).

    Returns (intersection (..., 2), parallel mask).
    (ref capability: MMLineIntersect node.)
    """
    p1, d1 = jnp.asarray(p1), jnp.asarray(d1)
    p2, d2 = jnp.asarray(p2), jnp.asarray(d2)
    cross = d1[..., 0] * d2[..., 1] - d1[..., 1] * d2[..., 0]
    parallel = jnp.abs(cross) < 1e-12
    diff = p2 - p1
    t = (
        diff[..., 0] * d2[..., 1] - diff[..., 1] * d2[..., 0]
    ) / jnp.where(parallel, 1.0, cross)
    return p1 + t[..., None] * d1, parallel
