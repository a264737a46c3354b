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


def _batch_fn(n_segments=500, batch=3):
    """The SHARED (batch, 256, 256, 3) SLIC+connectivity executable from
    conftest — one compile for this file AND the crossval pin."""
    from conftest import slic_count_fn

    return slic_count_fn(n_segments=n_segments, batch=batch)


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
def test_runs_path_bit_equality_fragment_heavy():
    """The run-structured fast path (production route via
    ``enforce_label_connectivity_batched``) is BIT-identical to the exact
    per-pixel path on the fragment-heaviest real raw SLIC maps — the
    direct runs-vs-pixel pin the round-3 ``run_compress`` rewrite lacked
    (advisor r4 medium)."""
    import jax
    import jax.numpy as jnp

    from camouflage_multimodal_tpu.ops.connectivity import (
        enforce_label_connectivity, enforce_label_connectivity_batched)
    from camouflage_multimodal_tpu.ops.slic import slic

    @jax.jit
    def raw_maps(imgs):
        return jax.vmap(lambda im: slic(
            im.astype(jnp.float32) / 255.0, n_segments=500,
            enforce_connectivity=False))(imgs)

    raw = raw_maps(jnp.asarray(_load_batch(256)))
    pixel = jax.device_get(jax.vmap(
        lambda x: enforce_label_connectivity(x, 500, max_labels=1000))(raw))
    batched, fb = jax.device_get(enforce_label_connectivity_batched(
        raw, 500, max_labels=1000, return_fallback=True))
    assert not fb  # real maps fit the default HW//4 run bucket
    np.testing.assert_array_equal(pixel, batched)


def test_runs_path_bit_equality_engineered():
    """Engineered runs-vs-pixel equality cases: the run-bucket boundary
    (count == R stays on the fast path, count == R+1 falls back — both
    exact), and the C-overflow regime (raw components > max_components
    while runs fit the bucket), where round-1 smallness must come from RAW
    per-root sizes on both paths (advisor r4 low)."""
    import jax
    import jax.numpy as jnp

    from camouflage_multimodal_tpu.ops.connectivity import (
        enforce_label_connectivity, enforce_label_connectivity_batched)

    def both(labels, run_bucket=None, max_components=None, n_segments=4):
        kw = dict(max_labels=64, max_components=max_components)
        pixel = jax.device_get(jax.vmap(lambda x: enforce_label_connectivity(
            x, n_segments, **kw))(labels))
        batched, fb = jax.device_get(enforce_label_connectivity_batched(
            labels, n_segments, run_bucket=run_bucket,
            return_fallback=True, **kw))
        np.testing.assert_array_equal(pixel, batched)
        return bool(fb)

    # Exact run count: H=8, W=16, vertical stripe pairs → 8 runs/row = 64.
    yy, xx = np.mgrid[:8, :16]
    stripes = jnp.asarray(((xx // 2) % 2), jnp.int32)[None]
    assert both(stripes, run_bucket=64) is False   # count == R: fast path
    assert both(stripes, run_bucket=63) is True    # count == R+1: fallback
    assert both(stripes, run_bucket=8) is True     # deep overflow: fallback

    # C-overflow, runs in-bucket: single-row horizontal stripes → 64 raw
    # components AND 64 runs on a 64×8 map; max_components=16 < 64 clamps
    # the raster tail into compact id 15 on BOTH paths, run bucket 128 ≥ 64
    # keeps the fast path live. Equality here exercises the raw-smallness
    # round-1 fix.
    rows = jnp.asarray(np.mgrid[:64, :8][0] % 2, jnp.int32)[None]
    assert both(rows, run_bucket=128, max_components=16) is False

    # Fragmented map mixing large and sub-min_size components, C overflow:
    # 32×32 quadrant base with a 1-px checker patch confined to one corner
    # (42 runs/row max → well inside the bucket; ~70 raw components > C=32).
    base = (np.mgrid[:32, :32][0] >= 16).astype(np.int32) * 2 \
        + (np.mgrid[:32, :32][1] >= 16).astype(np.int32)
    patch = np.indices((8, 8)).sum(0) % 2 + 4
    base[:8, :8] = patch
    frag = jnp.asarray(base, jnp.int32)[None]
    assert both(frag, run_bucket=512, max_components=32) is False


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

    run = _batch_fn()  # the shared batch-3 executable (no extra compile)
    imgs = jnp.asarray(_load_batch(256))
    n = imgs.shape[0]

    out = run(imgs)  # compile + warm
    np.asarray(out[1])

    best = float("inf")
    for _ in range(4):
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
