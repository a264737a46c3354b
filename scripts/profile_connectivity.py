"""Differential breakdown of the connectivity stage on the live TPU.

Splits the pipeline's most expensive stage (``enforce_label_connectivity``,
see ``docs/ARCHITECTURE.md`` per-stage table) into its two halves on a real
SLIC label batch (16 x 352^2, n_segments=500):

  - ``connected_components`` alone (the cummin sweep fixpoint), plus the
    actual number of sweeps the batched while_loop executes per image;
  - the merge + relabel epilogue (by difference), whose cost is dominated
    by its 5 HW-sized irregular ops (2 segment_sums + 2 gathers +
    1 segment_min) at the measured ~8 ns/element scatter/gather floor.

Every timed call ends with a device->host scalar pull (this runtime's
``block_until_ready`` can return at enqueue time — see CLAUDE.md).
"""
import glob
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import importlib
import time

import numpy as np

import jax
import jax.numpy as jnp

from camouflage_multimodal_tpu.core.runtime import enable_persistent_compile_cache

enable_persistent_compile_cache()

# ops/__init__ re-exports the jitted `slic` callable under the submodule
# names, so attribute imports would shadow the modules.
slic_mod = importlib.import_module("camouflage_multimodal_tpu.ops.slic")
conn = importlib.import_module("camouflage_multimodal_tpu.ops.connectivity")

from camouflage_multimodal_tpu.data.cod10k import load_image_rgb
from camouflage_multimodal_tpu.pipeline import padded_nodes

B, H, N = 16, 352, 500
paths = sorted(glob.glob("/root/reference/data/COD10K/images/*.jpg"))[:B]
imgs = jnp.asarray(np.stack([load_image_rgb(p, H) for p in paths]))

# Raw SLIC assignment labels (pre-connectivity), the stage's real input.
raw = jax.jit(jax.vmap(lambda im: slic_mod.slic(
    im, n_segments=N, enforce_connectivity=False)))(imgs)
_ = np.asarray(raw[0, 0, 0])  # completion pull
print("raw labels ready", raw.shape, raw.dtype)

K = padded_nodes(N, H)


def timed(fn, name, iters=6):
    out = fn(raw)  # warmup/compile
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    ts = []
    for _i in range(iters):
        t0 = time.perf_counter()
        out = fn(raw)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    ms = np.median(ts) * 1000.0
    print(f"{name:34s} {ms:8.2f} ms/batch  {ms / B:6.2f} ms/img")
    return ms


cc_only = jax.jit(jax.vmap(conn.connected_components))
full = jax.jit(jax.vmap(lambda l: conn.enforce_label_connectivity(
    l, N, max_labels=K)))

m_cc = timed(cc_only, "connected_components")
m_full = timed(full, "enforce_label_connectivity")
print(f"{'merge+relabel (diff)':34s} {m_full - m_cc:8.2f} ms/batch  "
      f"{(m_full - m_cc) / B:6.2f} ms/img")


def cc_sweeps(labels):
    """Instrumented copy of the connected_components fixpoint loop."""
    hh, ww = labels.shape
    idx = jnp.arange(hh * ww, dtype=jnp.int32).reshape(hh, ww)
    s_cols = conn._run_ids(labels, 1)
    s_rows = conn._run_ids(labels, 0)

    def body(st):
        comp, _, n = st
        new = conn._seg_min_scan(comp, labels, axis=1, run_ids=s_cols)
        new = conn._seg_min_scan(new, labels, axis=0, run_ids=s_rows)
        return new, jnp.array_equal(new, comp), n + 1

    _, _, n = jax.lax.while_loop(lambda st: ~st[1], body,
                                 (idx, jnp.asarray(False), jnp.int32(0)))
    return n


ns = jax.jit(jax.vmap(cc_sweeps))(raw)
print("CC sweeps per image:", np.asarray(ns))
