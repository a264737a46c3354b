"""Elementwise / convolutional image ops (VPU-friendly, fused by XLA).

Replaces the reference's PIL/torchvision/scipy preprocessing chain
(``/root/reference/models/region_graph/train.py:56-79`` and
``extract_rg_embeddings.py:260-276``): ImageNet normalize/denormalize,
grayscale with the exact reference weights, separable Gaussian blur matching
``scipy.ndimage.gaussian_filter``, and sRGB→CIELAB for the SLIC kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# Exact grayscale weights used by the reference feature extractor
# (region_graph/train.py:109).
GRAY_WEIGHTS = (0.2989, 0.5870, 0.1140)


def imagenet_normalize(img: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, 3) float image in [0,1] → ImageNet-normalized."""
    mean = jnp.asarray(IMAGENET_MEAN, dtype=img.dtype)
    std = jnp.asarray(IMAGENET_STD, dtype=img.dtype)
    return (img - mean) / std


def imagenet_denormalize(img: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`imagenet_normalize`, clipped to [0,1] as the
    reference does (train.py:78-79)."""
    mean = jnp.asarray(IMAGENET_MEAN, dtype=img.dtype)
    std = jnp.asarray(IMAGENET_STD, dtype=img.dtype)
    return jnp.clip(img * std + mean, 0.0, 1.0)


def rgb_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, 3) → (..., H, W) with the reference's weights."""
    w = jnp.asarray(GRAY_WEIGHTS, dtype=img.dtype)
    return img @ w


def _gaussian_kernel1d(sigma: float, truncate: float = 4.0) -> jnp.ndarray:
    """Matches scipy.ndimage._gaussian_kernel1d (radius = trunc*sigma+0.5)."""
    radius = int(truncate * sigma + 0.5)
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def _pad_2d(img: jnp.ndarray, pad: int, mode: str) -> jnp.ndarray:
    if mode == "reflect":
        # scipy 'reflect' == numpy 'symmetric' (edge value repeated)
        return jnp.pad(img, ((pad, pad), (pad, pad)), mode="symmetric")
    if mode == "mirror":
        return jnp.pad(img, ((pad, pad), (pad, pad)), mode="reflect")
    if mode == "nearest":
        return jnp.pad(img, ((pad, pad), (pad, pad)), mode="edge")
    if mode == "constant":
        return jnp.pad(img, ((pad, pad), (pad, pad)), mode="constant")
    raise ValueError(f"unknown pad mode {mode}")


@functools.partial(jax.jit, static_argnames=("sigma", "mode", "truncate"))
def gaussian_blur(img: jnp.ndarray, sigma: float, mode: str = "reflect",
                  truncate: float = 4.0) -> jnp.ndarray:
    """Separable Gaussian blur on an (H, W) or (H, W, C) image.

    Numerically matches ``scipy.ndimage.gaussian_filter(img, sigma, mode=...)``
    (same kernel radius/weights); validated in tests.
    """
    if sigma <= 0:
        return img
    if img.ndim == 3:
        return jnp.stack(
            [gaussian_blur(img[..., c], sigma, mode, truncate) for c in range(img.shape[-1])],
            axis=-1,
        )
    k = _gaussian_kernel1d(sigma, truncate).astype(img.dtype)
    pad = (k.shape[0] - 1) // 2
    x = _pad_2d(img, pad, mode)
    # Convolve rows then columns (correlation == convolution: symmetric
    # kernel). precision="highest" keeps f32 accumulation — JAX's default
    # conv precision is reduced and breaks parity with scipy.
    conv = functools.partial(jnp.convolve, mode="valid", precision="highest")
    x = jax.vmap(lambda row: conv(row, k))(x)
    x = jax.vmap(lambda col: conv(col, k), in_axes=1, out_axes=1)(x)
    return x


def sobel_h(img: jnp.ndarray, mode: str = "reflect") -> jnp.ndarray:
    """scipy.ndimage.sobel(img, axis=0): derivative along rows (y)."""
    return _sobel(img, axis=0, mode=mode)


def sobel_v(img: jnp.ndarray, mode: str = "reflect") -> jnp.ndarray:
    """scipy.ndimage.sobel(img, axis=1): derivative along cols (x)."""
    return _sobel(img, axis=1, mode=mode)


def _correlate1d(img: jnp.ndarray, k: jnp.ndarray, axis: int, mode: str) -> jnp.ndarray:
    pad = (k.shape[0] - 1) // 2
    x = _pad_2d(img, pad, mode)
    kc = k[::-1]  # correlate = convolve with flipped kernel
    conv = functools.partial(jnp.convolve, mode="valid", precision="highest")
    if axis == 0:
        x = jax.vmap(lambda col: conv(col, kc), in_axes=1, out_axes=1)(x)
        return x[:, pad:-pad] if pad else x
    else:
        x = jax.vmap(lambda row: conv(row, kc))(x)
        return x[pad:-pad, :] if pad else x


def _sobel(img: jnp.ndarray, axis: int, mode: str) -> jnp.ndarray:
    deriv = jnp.asarray([-1.0, 0.0, 1.0], dtype=img.dtype)
    smooth = jnp.asarray([1.0, 2.0, 1.0], dtype=img.dtype)
    x = _correlate1d(img, deriv, axis=axis, mode=mode)
    x = _correlate1d(x, smooth, axis=1 - axis, mode=mode)
    return x


# ---------------------------------------------------------------------------
# sRGB → CIELAB (D65), standard formulas, for the SLIC kernel.
# ---------------------------------------------------------------------------

_XYZ_FROM_RGB = (
    (0.412453, 0.357580, 0.180423),
    (0.212671, 0.715160, 0.072169),
    (0.019334, 0.119193, 0.950227),
)
_D65_WHITE = (0.95047, 1.0, 1.08883)


def rgb_to_lab(rgb: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) sRGB in [0,1] → CIELAB. Matches skimage.color.rgb2lab."""
    srgb = jnp.clip(rgb, 0.0, 1.0)
    linear = jnp.where(srgb > 0.04045, ((srgb + 0.055) / 1.055) ** 2.4, srgb / 12.92)
    m = jnp.asarray(_XYZ_FROM_RGB, dtype=rgb.dtype)
    xyz = linear @ m.T
    white = jnp.asarray(_D65_WHITE, dtype=rgb.dtype)
    t = xyz / white
    delta = 6.0 / 29.0
    f = jnp.where(t > delta**3, jnp.cbrt(t), t / (3 * delta**2) + 4.0 / 29.0)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    L = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    return jnp.stack([L, a, b], axis=-1)
