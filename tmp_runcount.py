import glob
import importlib

import numpy as np
import jax
import jax.numpy as jnp

from camouflage_multimodal_tpu.core.runtime import enable_persistent_compile_cache
enable_persistent_compile_cache()

slic_mod = importlib.import_module("camouflage_multimodal_tpu.ops.slic")
from camouflage_multimodal_tpu.data.cod10k import load_image_rgb

B, H, N = 16, 352, 500
paths = sorted(glob.glob("/root/reference/data/COD10K/images/*.jpg"))[:B]
imgs = jnp.asarray(np.stack([load_image_rgb(p, H) for p in paths]))

raw = jax.jit(jax.vmap(lambda im: slic_mod.slic(
    im, n_segments=N, enforce_connectivity=False)))(imgs)

@jax.jit
def run_counts(lab):
    starts = jnp.concatenate(
        [jnp.ones(lab.shape[:1] + (lab.shape[1], 1), bool),
         lab[:, :, 1:] != lab[:, :, :-1]], axis=2)
    return starts.reshape(lab.shape[0], -1).sum(axis=1)

c = np.asarray(run_counts(raw))
print("HW =", H * H, " runs per image:", c)
print("max =", c.max(), " ratio HW/max =", (H * H) / c.max())
