"""Sphere-grid coordinate conversions.

The pipeline works on the unit hemisphere (z >= 0). A point on the hemisphere
is parameterised by two angles (alpha, beta) in [-pi/2, pi/2]^2:

    p = (sin(alpha) cos(beta), sin(beta), cos(alpha) cos(beta))

A square "sphere image" of shape (M, N) discretises (alpha, beta): cell index
``a`` along alpha maps to cell-centre angle ``(a - M/2 + 0.5) * pi / M``.

Behavioral parity with the reference implementation
(``coordinate_conversion.py:4-61`` and the batched duplicate at
``probability_functions.py:252-259`` of fkluger/vanishing_points_2017),
re-derived here as batched, jittable jnp functions:

* ``angle_to_point`` multiplies by ``sign(z)`` which is 0 for z == 0 — a point
  exactly on the horizon great circle collapses to the zero vector. This quirk
  is preserved (it matches the reference's ``np.sign`` semantics).
* ``point_to_angle`` clamps ``x / cos(beta)`` into [-1, 1] before arcsin.

All functions accept arbitrary leading batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp


def index_to_angle(index: jnp.ndarray, shape: tuple[int, int]) -> jnp.ndarray:
    """Grid index -> cell-centre angle.

    index: (..., 2) array of (a, b) grid indices (may be fractional).
    shape: (M, N) of the grid.
    Returns (..., 2) array of (alpha, beta).
    """
    index = jnp.asarray(index)
    m = jnp.asarray(shape, dtype=index.dtype)
    return (index - 0.5 * m + 0.5) * jnp.pi / m


def angle_to_index(angle: jnp.ndarray, shape: tuple[int, int]) -> jnp.ndarray:
    """Angle -> (fractional) grid index. Inverse of :func:`index_to_angle`."""
    angle = jnp.asarray(angle)
    m = jnp.asarray(shape, dtype=angle.dtype)
    return (angle / jnp.pi + 0.5 - 0.5 / m) * m


def angle_to_point(angle: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) angles (alpha, beta) -> (..., 3) unit hemisphere points (z>=0).

    Multiplies by sign(z): a point with z == 0 maps to the zero vector,
    matching the reference's ``np.sign`` behaviour.
    """
    alpha = angle[..., 0]
    beta = angle[..., 1]
    point = jnp.stack(
        [
            jnp.sin(alpha) * jnp.cos(beta),
            jnp.sin(beta),
            jnp.cos(alpha) * jnp.cos(beta),
        ],
        axis=-1,
    )
    return point * jnp.sign(point[..., 2:3])


def point_to_angle(point: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) unit points -> (..., 2) angles (alpha, beta).

    beta = arcsin(y); alpha = arcsin(clip(x / cos(beta), -1, 1)).
    """
    beta = jnp.arcsin(point[..., 1])
    inner = point[..., 0] / jnp.cos(beta)
    alpha = jnp.arcsin(jnp.clip(inner, -1.0, 1.0))
    return jnp.stack([alpha, beta], axis=-1)
