"""Pallas SLIC assignment kernel (MXU formulation).

The XLA path of :mod:`camouflage_multimodal_tpu.ops.slic` assigns each pixel
by gathering its 9 candidate cluster centers. This kernel reformulates the
assignment as one MXU matmul against ALL K cluster centers — pixels tiled
through VMEM, distance = ‖p‖²−2p·c+‖c‖² with the spatial dims pre-scaled by
√(m/S), and the 3×3 grid window enforced as an in-kernel mask computed from
the pixel's grid cell vs each cluster's grid coordinates (no gathers at
all). argmin over the masked distance row gives the label.

At 256²/K=512 both paths are microseconds (the pipeline is host-bound), so
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


def _assign_kernel(pix_ref, cell_ref, centers_ref, cnorm_ref, gyx_ref, out_ref):
    """One pixel tile: pix (T, 8), cell (T, 2) int32 grid cell of each pixel,
    centers (K, 8), cnorm (1, K) = ‖c‖², gyx (2, K) cluster grid coords.
    Writes labels (T, 1) int32."""
    T = pix_ref.shape[0]
    K = centers_ref.shape[0]

    # -2 p·c + ‖c‖² (the ‖p‖² term is constant per row → argmin-invariant)
    cross = jax.lax.dot_general(
        pix_ref[:], centers_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (T, K)
    dist = cnorm_ref[0, :][None, :] - 2.0 * cross

    # 3×3 grid-cell window mask
    cy = cell_ref[:, 0][:, None]  # (T, 1)
    cx = cell_ref[:, 1][:, None]
    gy = gyx_ref[0, :][None, :]   # (1, K)
    gx = gyx_ref[1, :][None, :]
    ok = (jnp.abs(gy - cy) <= 1) & (jnp.abs(gx - cx) <= 1)
    dist = jnp.where(ok, dist, _BIG)

    out_ref[:, 0] = jnp.argmin(dist, axis=-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("gh", "gw", "tile", "interpret"))
def pallas_slic_assign(pix5: jnp.ndarray, centers5: jnp.ndarray,
                       cell_y: jnp.ndarray, cell_x: jnp.ndarray,
                       gh: int, gw: int, tile: int = 1024,
                       interpret: bool = False) -> jnp.ndarray:
    """Assign each pixel to its nearest windowed cluster.

    Args:
      pix5: (HW, 5) pixel features, spatial dims ALREADY scaled by √ratio.
      centers5: (K, 5) cluster features, same scaling.
      cell_y/cell_x: (HW,) int32 grid cell of each pixel.
      gh, gw: cluster grid shape (K = gh*gw).
    Returns (HW,) int32 labels.
    """
    HW = pix5.shape[0]
    K = centers5.shape[0]
    # pad features to 8 lanes for clean VMEM layout
    pix = jnp.pad(pix5.astype(jnp.float32), ((0, 0), (0, 3)))
    cen = jnp.pad(centers5.astype(jnp.float32), ((0, 0), (0, 3)))
    cnorm = jnp.sum(cen * cen, axis=-1)[None, :]                     # (1, K)
    k_ids = jnp.arange(K, dtype=jnp.int32)
    gyx = jnp.stack([k_ids // gw, k_ids % gw]).astype(jnp.int32)     # (2, K)
    cell = jnp.stack([cell_y, cell_x], axis=-1).astype(jnp.int32)    # (HW, 2)

    n_tiles = pl.cdiv(HW, tile)
    pad = n_tiles * tile - HW
    if pad:
        pix = jnp.pad(pix, ((0, pad), (0, 0)))
        cell = jnp.pad(cell, ((0, pad), (0, 0)))

    labels = pl.pallas_call(
        _assign_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile, 1), jnp.int32),
        interpret=interpret,
    )(pix, cell, cen, cnorm, gyx)
    return labels[:HW, 0]
