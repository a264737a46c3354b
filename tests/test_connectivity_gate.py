"""Connectivity regression gate (VERDICT r3 item 2).

Round 3's final snapshot landed an untested ``run_compress`` rewrite of
``ops/connectivity.py`` whose static run bucket (HW//8) overflowed on real
fragment-heavy raw SLIC maps (11,162 row-runs vs 8,192 slots on
Octopus-446 @256²).  The corrupted size table over-merged components
(344 survivors vs the correct 494, composed fidelity 0.73 vs the 0.95
gate) AND kept the merge fixpoint spinning toward ``_MAX_MERGE_ROUNDS``
(connectivity 205 ms/img vs 9.5).  Nothing in the suite bounded either
symptom, so the regression reached the driver's benchmark.

This module pins BOTH symptoms on exactly the images that exposed the bug:

* **survivor counts** on fragment-heavy COD10K images vs the reference's
  recorded real-skimage ``num_nodes``
  (``rg_embeddings/embedding_summary.json``, the same source as
  ``tests/test_slic_crossval.py``), and
* **merge-round telemetry**: the fixpoint must converge in single-digit
  rounds (the broken size table spun it to the 64-round cap), and
* **a wall-clock ceiling** per image for the composed SLIC+connectivity
  call, with generous per-platform margin (the regression was >20×).

If a d65a020-class change re-lands, this file turns the suite red.
"""

import json
import os
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_SUMMARY = ("/root/reference/models/region_graph/rg_embeddings/"
               "embedding_summary.json")
IMG_DIR = "/root/reference/data/COD10K/images"

# Fragment-heavy tail: Octopus-446 is the measured worst case (11,162
# row-runs at 256², the exact image that broke the HW//8 bucket); the other
# two are among the highest recorded real-skimage node counts (528-530 of a
# 500-segment request → raw maps with heavy sub-min_size fragmentation).
FRAGMENT_HEAVY = [
    "COD10K-CAM-1-Aquatic-11-Octopus-446",
    "COD10K-CAM-3-Flying-59-Grasshopper-3715",
    "COD10K-CAM-2-Terrestrial-23-Cat-1529",
]

needs_data = pytest.mark.skipif(
    not (os.path.isdir(IMG_DIR) and os.path.exists(REF_SUMMARY)),
    reason="COD10K mount missing")


def _load_batch(size):
    from camouflage_multimodal_tpu.data.cod10k import load_image_rgb

    imgs = np.stack([
        (load_image_rgb(os.path.join(IMG_DIR, n + ".jpg"), size) * 255.0)
        .round().astype(np.uint8) for n in FRAGMENT_HEAVY])
    return imgs


def _batch_fn(n_segments=500):
    import jax
    import jax.numpy as jnp

    from camouflage_multimodal_tpu.ops.connectivity import (
        enforce_label_connectivity)
    from camouflage_multimodal_tpu.ops.slic import slic

    @jax.jit
    def run(imgs):
        def one(im):
            raw = slic(im.astype(jnp.float32) / 255.0, n_segments=n_segments,
                       enforce_connectivity=False)
            return enforce_label_connectivity(
                raw, n_segments, return_count=True, return_rounds=True)

        return jax.vmap(one)(imgs)

    return run


@needs_data
def test_fragment_heavy_survivor_counts_and_rounds():
    """Survivor counts track real skimage; the merge fixpoint converges."""
    import jax

    ref = {k: v["num_nodes"]
           for k, v in json.load(open(REF_SUMMARY))["images"].items()}
    run = _batch_fn()
    labels, counts, rounds = jax.device_get(run(_load_batch(256)))

    for i, name in enumerate(FRAGMENT_HEAVY):
        delta = int(counts[i]) - ref[name + ".jpg"]
        # The d65a020 bug over-merged Octopus-446 to 344 survivors
        # (delta −152); healthy residual vs real skimage is single digits
        # (crossval median |Δ| ≤ 8 over all 6,000 images).
        assert abs(delta) <= 25, (name, int(counts[i]), ref[name + ".jpg"])
        # Size-table corruption spins the fixpoint toward the 64-round cap;
        # real maps converge in 1-3 absorb rounds.
        assert int(rounds[i]) <= 8, (name, int(rounds[i]))
        # Emitted labels are sequential: max label + 1 == survivor count.
        assert labels[i].max() + 1 == counts[i], name


@needs_data
def test_fragment_heavy_raw_counts_inside_static_bucket():
    """The C = 16·n_segments compact-component bucket holds the real
    fragment tail with wide margin (measured worst: Octopus-446 = 1,278
    raw components vs C = 8,000). If SLIC dynamics ever push raw counts
    toward the bucket, this trips BEFORE the clamp starts over-merging."""
    import jax

    from camouflage_multimodal_tpu.ops.connectivity import (
        enforce_label_connectivity)
    from camouflage_multimodal_tpu.ops.slic import slic

    @jax.jit
    def raw_counts(imgs):
        def one(im):
            raw = slic(im.astype("float32") / 255.0, n_segments=500,
                       enforce_connectivity=False)
            return enforce_label_connectivity(raw, 500,
                                              return_raw_count=True)[1]

        return jax.vmap(one)(imgs)

    counts = np.asarray(raw_counts(np.asarray(_load_batch(256))))
    assert counts.max() < 16 * 500 // 4, counts  # ≥4× headroom demanded


def test_component_bucket_overflow_policy():
    """A 2-color checkerboard has one 4-connected component PER PIXEL —
    the no-a-priori-bound worst case. The static bucket must (a) report
    the overflow via return_raw_count, (b) clamp deterministically into
    the last compact id instead of corrupting tables or spinning the merge
    fixpoint (the d65a020 failure mode), and (c) still emit a valid
    sequential partition. max_components lets callers buy the bucket the
    input actually needs."""
    import jax
    import jax.numpy as jnp

    from camouflage_multimodal_tpu.ops.connectivity import (
        enforce_label_connectivity)

    H = W = 48
    yy, xx = np.mgrid[:H, :W]
    checker = jnp.asarray((yy + xx) % 2, jnp.int32)

    out, count, rounds, raw = jax.device_get(enforce_label_connectivity(
        checker, n_segments=4, return_count=True, return_rounds=True,
        return_raw_count=True))
    assert raw == H * W                      # every pixel its own component
    assert raw > 16 * 4                      # the default bucket overflowed
    assert rounds <= 16                      # fixpoint still terminates fast
    # sequential labels, full coverage of [0, count)
    assert out.min() == 0 and out.max() == count - 1
    assert len(np.unique(out)) == count

    # buying a big-enough bucket removes the clamp: min_size = 0.5·HW/4
    # = 288, so everything legitimately merges into ONE component
    out2, count2 = jax.device_get(enforce_label_connectivity(
        checker, n_segments=4, max_components=H * W,
        return_count=True))
    assert count2 == 1 and out2.max() == 0


@needs_data
def test_slic_connectivity_wallclock_ceiling():
    """Composed SLIC+connectivity per-image wall-clock stays within a
    generous platform-specific ceiling (the regression was >20× over).

    Best-of-3 timed passes absorbs tunnel stalls (CLAUDE.md timing rules);
    every pass ends with a device→host pull so enqueue-time returns from
    ``block_until_ready`` can't fake the measurement.
    """
    import jax
    import jax.numpy as jnp

    run = _batch_fn()
    imgs = jnp.asarray(np.repeat(_load_batch(256), 4, axis=0))  # batch 12
    n = imgs.shape[0]

    out = run(imgs)  # compile + warm
    np.asarray(out[1])

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(imgs)
        np.asarray(out[1])  # host pull == real completion barrier
        best = min(best, time.perf_counter() - t0)

    per_img_ms = best / n * 1e3
    # Healthy: ~6-10 ms/img on the tunneled TPU at 256², ~150 ms/img on the
    # forced-CPU host platform. Broken (d65a020): >200 ms/img on TPU, and
    # the 64-round spin inflates CPU similarly. Ceilings leave ~5× headroom
    # over healthy while sitting far below the regression.
    ceiling_ms = 900.0 if jax.default_backend() == "cpu" else 60.0
    assert per_img_ms < ceiling_ms, f"{per_img_ms:.1f} ms/img"
