"""Binary morphology as shift/max compositions (VPU elementwise, no scatter).

Replaces ``scipy.ndimage.binary_dilation`` used by the reference's per-region
shape features (``/root/reference/models/region_graph/train.py:135,143``).
scipy's default structuring element is the 4-connected cross
(``generate_binary_structure(2, 1)``), which is what the reference used.
"""

from __future__ import annotations

import jax.numpy as jnp


def _shift(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift a (..., H, W) map with zero fill (out-of-image = False)."""
    zero = x.dtype.type(0)
    out = jnp.roll(x, (dy, dx), axis=(-2, -1))
    if dy > 0:
        out = out.at[..., :dy, :].set(zero)
    elif dy < 0:
        out = out.at[..., dy:, :].set(zero)
    if dx > 0:
        out = out.at[..., :, :dx].set(zero)
    elif dx < 0:
        out = out.at[..., :, dx:].set(zero)
    return out


def binary_dilation_cross(mask: jnp.ndarray, iterations: int = 1) -> jnp.ndarray:
    """4-connected binary dilation, iterated. Matches
    ``scipy.ndimage.binary_dilation(mask, iterations=n)``."""
    out = mask.astype(jnp.bool_)
    for _ in range(iterations):
        out = (
            out
            | _shift(out, 1, 0)
            | _shift(out, -1, 0)
            | _shift(out, 0, 1)
            | _shift(out, 0, -1)
        )
    return out


def binary_dilation_full(mask: jnp.ndarray, iterations: int = 1) -> jnp.ndarray:
    """8-connected (3×3 square) binary dilation, iterated."""
    out = mask.astype(jnp.bool_)
    for _ in range(iterations):
        acc = out
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                acc = acc | _shift(out, dy, dx)
        out = acc
    return out
