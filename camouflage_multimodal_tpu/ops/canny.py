"""Canny edge detection as a fused, jittable JAX program.

Behavioral equivalent of ``skimage.feature.canny(gray, sigma=2)`` used by the
reference's edge-aware region features
(``/root/reference/models/region_graph/train.py:110`` and
``extract_rg_embeddings.py:152``):

1. Gaussian smoothing with border-bleed compensation (the skimage
   ``_preprocess`` trick: smooth with constant padding and divide by the
   smoothed all-ones mask so borders are not attenuated).
2. Sobel gradients (scipy kernels), magnitude.
3. Non-maximum suppression with bilinear interpolation of the two
   gradient-direction neighbors.
4. Double-threshold hysteresis (low=0.1, high=0.2 — skimage float-image
   defaults) via on-device flood fill: strong edges seed a masked dilation
   fixpoint over weak edges (``lax.while_loop``), which is exactly the
   connected-components semantics of skimage's hysteresis without host
   round-trips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from camouflage_multimodal_tpu.ops.image import gaussian_blur, sobel_h, sobel_v
from camouflage_multimodal_tpu.ops.morphology import _shift, binary_dilation_full


def _preprocess(image: jnp.ndarray, sigma: float) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Smoothed image + eroded border mask (skimage _preprocess, mask=None)."""
    H, W = image.shape
    ones = jnp.ones((H, W), dtype=image.dtype)
    smoothed = gaussian_blur(image, sigma, mode="constant")
    bleed = gaussian_blur(ones, sigma, mode="constant")
    smoothed = smoothed / (bleed + 1e-12)
    eroded = jnp.ones((H, W), dtype=bool)
    eroded = eroded.at[0, :].set(False).at[-1, :].set(False)
    eroded = eroded.at[:, 0].set(False).at[:, -1].set(False)
    return smoothed, eroded


def _nonmax_suppression(gy: jnp.ndarray, gx: jnp.ndarray, mag: jnp.ndarray,
                        mask: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-interpolated NMS along the gradient direction."""
    ay, ax = jnp.abs(gy), jnp.abs(gx)
    sy = jnp.where(gy >= 0, 1, -1)
    sx = jnp.where(gx >= 0, 1, -1)

    # Shifted magnitude maps; index [a, b] means neighbor at (y + a, x + b)
    # where a, b are the *signed* offsets realized through `where` selects.
    def nb(dy_sign, dx_sign):
        """Magnitude at (y + dy_sign*sy_like, x + dx_sign*sx_like) where the
        signs come from per-pixel sy/sx. dy_sign/dx_sign ∈ {0, +1, -1} select
        whether we move along/against the gradient component."""
        # Build the four (or two) shifted variants and select per pixel.
        out = None
        for cy in ((0,) if dy_sign == 0 else (1, -1)):
            for cx in ((0,) if dx_sign == 0 else (1, -1)):
                shifted = _shift(mag, -cy, -cx)  # value at (y+cy, x+cx)
                cond = jnp.ones_like(mag, dtype=bool)
                if dy_sign != 0:
                    cond = cond & (sy * dy_sign == cy)
                if dx_sign != 0:
                    cond = cond & (sx * dx_sign == cx)
                out = shifted * cond if out is None else out + shifted * cond
        return out

    # Case A: |gx| >= |gy| → interpolate between horizontal and diagonal.
    w_a = jnp.where(ax > 0, ay / jnp.maximum(ax, 1e-20), 0.0)
    a_plus = (1 - w_a) * nb(0, +1) + w_a * nb(+1, +1)
    a_minus = (1 - w_a) * nb(0, -1) + w_a * nb(-1, -1)
    keep_a = (mag >= a_plus) & (mag >= a_minus)

    # Case B: |gy| > |gx| → interpolate between vertical and diagonal.
    w_b = jnp.where(ay > 0, ax / jnp.maximum(ay, 1e-20), 0.0)
    b_plus = (1 - w_b) * nb(+1, 0) + w_b * nb(+1, +1)
    b_minus = (1 - w_b) * nb(-1, 0) + w_b * nb(-1, -1)
    keep_b = (mag >= b_plus) & (mag >= b_minus)

    keep = jnp.where(ax >= ay, keep_a, keep_b)
    return keep & mask & (mag > 0)


def _hysteresis(low_mask: jnp.ndarray, high_mask: jnp.ndarray) -> jnp.ndarray:
    """Keep low-threshold components connected (8-conn) to a strong pixel."""

    def cond(state):
        cur, changed = state
        return changed

    def body(state):
        cur, _ = state
        grown = binary_dilation_full(cur) & low_mask
        return grown, jnp.any(grown != cur)

    init = (high_mask & low_mask, jnp.asarray(True))
    out, _ = jax.lax.while_loop(cond, body, init)
    return out


@functools.partial(jax.jit, static_argnames=("sigma", "low_threshold", "high_threshold"))
def canny(gray: jnp.ndarray, sigma: float = 2.0, low_threshold: float = 0.1,
          high_threshold: float = 0.2) -> jnp.ndarray:
    """Canny edges of a float (H, W) image in [0,1]. Returns a bool map."""
    smoothed, eroded_mask = _preprocess(gray, sigma)
    gy = sobel_h(smoothed)
    gx = sobel_v(smoothed)
    mag = jnp.hypot(gy, gx)
    local_max = _nonmax_suppression(gy, gx, mag, eroded_mask)
    low_mask = local_max & (mag >= low_threshold)
    high_mask = local_max & (mag >= high_threshold)
    return _hysteresis(low_mask, high_mask)
