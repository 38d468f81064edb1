"""Biquadratic (3x3 Lagrange) flow-grid interpolation.

The multi-view solver evaluates each edge's 3x3 displacement grid at the
current source position via quadratic Lagrange interpolation with nodes at
{-0.5, 0, 0.5}, clamping queries to the box with *zero gradient* outside
(reference: multi-view-refinement/cost.cc:7-72).  The reference needs
hand-written Ceres Jet overloads (cost.cc:56-63); here ``jnp.clip`` gives the
identical clamp-with-zero-grad semantics for free under JAX autodiff.
"""

from __future__ import annotations

import jax.numpy as jnp

#: Query box: grid samples live at offsets {-0.5, 0, 0.5} displacement units
#: (reference: cost.cc:66-69).
BOX = 0.5


def lagrange_weights(t: jnp.ndarray) -> jnp.ndarray:
    """Quadratic Lagrange basis at nodes (-0.5, 0, 0.5) for query t.

    (reference: cost.cc:20-23.)  Returns (..., 3).
    """
    return jnp.stack(
        [
            2.0 * t * (t - 0.5),
            -4.0 * (t - 0.5) * (t + 0.5),
            2.0 * t * (t + 0.5),
        ],
        axis=-1,
    )


def interpolate_flow(grid: jnp.ndarray, row: jnp.ndarray, col: jnp.ndarray) -> jnp.ndarray:
    """Evaluate flow grids at (row, col) query points.

    Args:
      grid: (..., 3, 3, C) flow samples (C=2: di, dj).
      row, col: (...,) query coordinates in displacement units.

    Returns (..., C).  Queries are clamped to [-0.5, 0.5]^2; because the
    clamp happens inside the differentiable graph, gradients are exactly
    zero in the clamped direction — matching the reference's explicit
    zeroing (reference: cost.cc:37-44).
    """
    r = jnp.clip(row, -BOX, BOX)
    c = jnp.clip(col, -BOX, BOX)
    wr = lagrange_weights(r)  # (..., 3)
    wc = lagrange_weights(c)  # (..., 3)
    # f = sum_ij wr_i * wc_j * grid[..., i, j, :]
    return jnp.einsum("...i,...j,...ijc->...c", wr, wc, grid)
