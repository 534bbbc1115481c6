"""Correlation-peak location with sub-sample refinement.

The reference finds only the integer argmax over non-negative lags
(processor.go:686-726) and documents sub-sample interpolation as future
work (docs/audio-pattern-matching.md:128-131). Here the peak is located on
the full ±max_lag window and refined by a three-point parabolic fit —
vectorized over the leading (pair/batch) axes so it fuses into the
correlation program.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def parabolic_peak(y: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Sub-sample argmax of ``y`` along the last axis.

    Returns ``(pos, value)`` where ``pos`` is a float index into the last
    axis (integer argmax + parabolic offset in (-0.5, 0.5)) and ``value``
    is the interpolated peak height. Works on any leading batch shape.
    """
    n = y.shape[-1]
    idx = jnp.argmax(y, axis=-1)
    # Clamp so the three-point stencil stays in bounds; at a clamped edge
    # the fit degrades to the integer peak.
    ic = jnp.clip(idx, 1, n - 2)
    ym1 = jnp.take_along_axis(y, (ic - 1)[..., None], axis=-1)[..., 0]
    y0 = jnp.take_along_axis(y, ic[..., None], axis=-1)[..., 0]
    yp1 = jnp.take_along_axis(y, (ic + 1)[..., None], axis=-1)[..., 0]
    denom = ym1 - 2.0 * y0 + yp1
    offset = jnp.where(
        jnp.abs(denom) > 1e-12, 0.5 * (ym1 - yp1) / denom, 0.0
    )
    offset = jnp.clip(offset, -0.5, 0.5)
    # Only apply the refinement when the argmax wasn't clamped.
    interior = (idx >= 1) & (idx <= n - 2)
    pos = idx.astype(jnp.float32) + jnp.where(interior, offset, 0.0)
    value = jnp.where(
        interior, y0 - 0.25 * (ym1 - yp1) * offset, jnp.max(y, axis=-1)
    )
    return pos, value


def peak_quality(y: jax.Array, guard: int = 8) -> jax.Array:
    """Peak-to-sidelobe ratio along the last axis.

    Ratio of the peak to the mean magnitude outside a ±guard exclusion zone
    around it — a confidence measure used to weight solver residuals.
    """
    n = y.shape[-1]
    idx = jnp.argmax(y, axis=-1)
    peak = jnp.max(y, axis=-1)
    pos = jnp.arange(n)
    mask = jnp.abs(pos[None, :] - idx[..., None]) > guard  # [..., n]
    floor = jnp.sum(jnp.where(mask, y, 0.0), axis=-1) / jnp.maximum(
        jnp.sum(mask, axis=-1), 1
    )
    return peak / jnp.maximum(floor, 1e-12)
