"""Device-mesh parallelism.

The reference had no distributed code at all (SURVEY.md §2.3); this module is
the idiomatic TPU replacement for "single device, sequential loop": a
``jax.sharding.Mesh`` with a ``data`` axis for batch parallelism (train and
full-benchmark eval ride ICI collectives inserted by GSPMD) and a ``model``
axis that shards the fusion attention/FFN hidden dimension (tensor
parallelism — trivially small here, but wired so the same program scales).

Everything goes through plain ``jax.jit`` + ``NamedSharding``: annotate the
inputs, let the XLA partitioner insert the all-reduces (the scaling-book
recipe).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, data_axis: Optional[int] = None,
              model_axis: int = 1) -> Mesh:
    """A (data, model) mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data_axis is None:
        data_axis = n // model_axis
    assert data_axis * model_axis == n, (data_axis, model_axis, n)
    dev_array = np.asarray(devices).reshape(data_axis, model_axis)
    return Mesh(dev_array, axis_names=("data", "model"))


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree on every device of the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(tree: Any, mesh: Mesh) -> Any:
    """Shard leading (batch) axis of every leaf over the ``data`` axis."""

    def put(x):
        spec = P("data", *([None] * (x.ndim - 1))) if x.ndim >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def shard_spatial(images: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Shard image ROWS over the ``model`` axis (spatial parallelism).

    For batch-1 / high-resolution inputs the ``data`` axis cannot help — one
    image is one shard. Splitting the height axis across chips instead lets
    GSPMD partition the stencil stages of the region-graph build (Gaussian,
    Sobel, NMS, the banded SLIC assign/update) with halo exchanges on ICI and
    fall back to collectives for the global passes (connectivity min-scans,
    segment reductions). Same program, same math — only the layout changes,
    so this composes with ``shard_batch`` (batch over ``data``, rows over
    ``model``). Used by ``RegionGraphPipeline(spatial=True)``.
    """
    spec = P("data", "model", *([None] * (images.ndim - 2)))
    return jax.device_put(images, NamedSharding(mesh, spec))


def shard_fusion_params(params: Any, mesh: Mesh) -> Any:
    """Tensor-shard the fusion model: attention QKV/out kernels and FFN
    kernels split on their hidden dimension over ``model``; everything else
    replicated. GSPMD propagates the activation shardings and inserts the
    collectives."""

    def put(path, x):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        joined = "/".join(str(n) for n in names)
        if x.ndim == 2 and ("cross_attn" in joined and any(k in joined for k in ("wq", "wk", "wv"))):
            spec = P(None, "model")  # column-parallel in-projections
        elif x.ndim == 2 and "cross_attn" in joined and "wo" in joined:
            spec = P("model", None)  # row-parallel out-projection
        elif x.ndim == 2 and "ffn" in joined and "fc1" in joined and "kernel" in joined:
            spec = P(None, "model")
        elif x.ndim == 2 and "ffn" in joined and "fc2" in joined and "kernel" in joined:
            spec = P("model", None)
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, params)
