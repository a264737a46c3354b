"""Pallas SLIC assignment kernel (MXU formulation).

The XLA path of :mod:`camouflage_multimodal_tpu.ops.slic` assigns each pixel
by gathering its 25 candidate cluster centers. This kernel reformulates the
assignment as one MXU matmul against ALL K cluster centers — pixels tiled
through VMEM, distance = ‖p‖²−2p·c+‖c‖² with the spatial dims pre-scaled by
√(m/step) — and applies skimage's ±step search-box constraint
(``reference_pipeline.slic_np:156-158``) as an in-kernel mask of the pixel's
integer coordinates against each center's current floor position. Because
every center is scored, the result is exact by construction (no candidate-
window approximation at all). argmin over the masked row gives the label;
rows no box covers keep the previous iteration's label (skimage leaves
``labels`` untouched where no window visits).

At 256²/K=529 both paths are microseconds (the pipeline is host-bound), so
this is flag-gated (``slic(..., backend="pallas")``) — it exists for larger
grids where the gather path stops fitting and as the pattern for scaling the
superpixel stage.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30


def _assign_kernel(step_ref, pix_ref, pyx_ref, prev_ref, centers_ref,
                   cnorm_ref, cyx_ref, out_ref):
    """One pixel tile: pix (T, 8) scaled features, pyx (T, 2) int32 pixel
    coords, prev (T, 1) previous labels, centers (K, 8) scaled, cnorm (1, K)
    = ‖c‖², cyx (2, K) floor of the centers' current (y, x). Writes labels
    (T, 1) int32."""
    # -2 p·c + ‖c‖² (the ‖p‖² term is constant per row → argmin-invariant)
    cross = jax.lax.dot_general(
        pix_ref[:], centers_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (T, K)
    dist = cnorm_ref[0, :][None, :] - 2.0 * cross

    # ±step box around the current center position
    step = step_ref[0]
    py = pyx_ref[:, 0][:, None]   # (T, 1)
    px = pyx_ref[:, 1][:, None]
    cy = cyx_ref[0, :][None, :]   # (1, K)
    cx = cyx_ref[1, :][None, :]
    ok = (jnp.abs(py - cy) <= step) & (jnp.abs(px - cx) <= step)
    dist = jnp.where(ok, dist, _BIG)

    best = jnp.argmin(dist, axis=-1).astype(jnp.int32)
    covered = jnp.min(dist, axis=-1) < _BIG * 0.5
    out_ref[:, 0] = jnp.where(covered, best, prev_ref[:, 0])


@functools.partial(jax.jit, static_argnames=("step", "tile", "interpret"))
def pallas_slic_assign(pix5: jnp.ndarray, centers5: jnp.ndarray,
                       py: jnp.ndarray, px: jnp.ndarray,
                       cy: jnp.ndarray, cx: jnp.ndarray,
                       step: int, prev: jnp.ndarray,
                       tile: int = 1024,
                       interpret: bool = False) -> jnp.ndarray:
    """Assign each pixel to its nearest box-constrained cluster.

    Args:
      pix5: (HW, 5) pixel features, spatial dims ALREADY scaled by √ratio.
      centers5: (K, 5) cluster features, same scaling.
      py/px: (HW,) int32 pixel coordinates (unscaled).
      cy/cx: (K,) float32 current center positions (unscaled).
      step: SLIC seed spacing (box half-width).
      prev: (HW,) int32 labels from the previous iteration (fallback).
    Returns (HW,) int32 labels.
    """
    HW = pix5.shape[0]
    K = centers5.shape[0]
    # pad features to 8 lanes for clean VMEM layout
    pix = jnp.pad(pix5.astype(jnp.float32), ((0, 0), (0, 3)))
    cen = jnp.pad(centers5.astype(jnp.float32), ((0, 0), (0, 3)))
    cnorm = jnp.sum(cen * cen, axis=-1)[None, :]                     # (1, K)
    cyx = jnp.stack([jnp.floor(cy), jnp.floor(cx)]).astype(jnp.int32)  # (2, K)
    pyx = jnp.stack([py, px], axis=-1).astype(jnp.int32)             # (HW, 2)

    n_tiles = pl.cdiv(HW, tile)
    pad = n_tiles * tile - HW
    prev2 = prev.astype(jnp.int32)[:, None]
    if pad:
        pix = jnp.pad(pix, ((0, pad), (0, 0)))
        pyx = jnp.pad(pyx, ((0, pad), (0, 0)))
        prev2 = jnp.pad(prev2, ((0, pad), (0, 0)))

    labels = pl.pallas_call(
        _assign_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile, 1), jnp.int32),
        interpret=interpret,
    )(jnp.asarray([step], jnp.int32), pix, pyx, prev2, cen, cnorm, cyx)
    return labels[:HW, 0]
