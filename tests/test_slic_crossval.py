"""SLIC node-count cross-validation against the reference's recorded outputs.

The reference ships per-image ``num_nodes`` for all 6,000 COD10K images from
the author's real ``skimage.segmentation.slic`` run
(``/root/reference/models/region_graph/rg_embeddings/embedding_summary.json``,
produced by ``extract_rg_embeddings.py:144,260-276``).  These tests pin

* the committed full-scale comparison (``artifacts/slic_node_crossval.json``,
  written by ``scripts/slic_node_crossval.py`` over all 6,000 images), and
* a live recompute on a small interleaved sample,

so the fidelity gate's SLIC contract stays grounded in output produced by
actual skimage rather than only in the repo's own ports (VERDICT r2 item 2).
"""

import json
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(REPO, "artifacts", "slic_node_crossval.json")
REF_SUMMARY = ("/root/reference/models/region_graph/rg_embeddings/"
               "embedding_summary.json")


def test_crossval_artifact_distribution():
    """The committed 6,000-image comparison keeps its measured shape."""
    report = json.load(open(ARTIFACT))
    j = report["jax_vs_skimage"]
    assert j["n_images"] == 6000
    # No systematic bias: the mean signed delta is a fraction of a node.
    assert abs(j["mean_delta"]) < 1.0
    # Typical disagreement is a handful of segments out of ~500 (the
    # residual is skimage-version k-means micro-behavior, see the artifact
    # notes), and the tail is bounded.
    assert j["median_abs_delta"] <= 8.0
    assert j["p90_abs_delta"] <= 20.0
    assert j["pct_within_10"] >= 70.0
    # Every COD10K environment, including NonCAM, is covered and none is an
    # outlier.
    cats = j["per_category"]
    for cat in ("Aquatic", "Terrestrial", "Flying", "Amphibian", "NonCAM"):
        assert cat in cats, cat
        assert cats[cat]["median_abs_delta"] <= 10.0, cat
    # The numpy reference port (the fidelity gate's "reference side") sits
    # the same small distance from real skimage as the JAX kernel does.
    npp = report["npport_vs_skimage"]
    assert npp["median_abs_delta"] <= 8.0


def test_live_node_counts_vs_reference_recorded():
    """Recompute a stratified sample and compare against real-skimage counts.

    Fast pin for every suite run (VERDICT r4 item 8): 21 interleaved images
    spanning all categories, computed through the SHARED batch-3
    SLIC+connectivity executable from conftest — the compile is paid once
    per process across this file and test_connectivity_gate (the old
    per-file batch-16 variant cost its own 240 s live-TPU compile). The
    full 6,000-image sweep stays in scripts/slic_node_crossval.py (its
    committed artifact is pinned above)."""
    import jax
    import jax.numpy as jnp

    from conftest import slic_count_fn
    from camouflage_multimodal_tpu.data.cod10k import load_image_rgb

    ref = {k: v["num_nodes"]
           for k, v in json.load(open(REF_SUMMARY))["images"].items()}
    names = sorted(ref)[::290][:21]  # interleaved => spans categories
    img_dir = "/root/reference/data/COD10K/images"

    run = slic_count_fn(n_segments=500, batch=3)
    imgs = np.stack([
        (load_image_rgb(os.path.join(img_dir, n), 256) * 255.0)
        .round().astype(np.uint8) for n in names])
    counts = np.concatenate([
        np.asarray(run(jnp.asarray(imgs[s:s + 3]))[1])
        for s in range(0, len(names), 3)])

    deltas = np.array([int(c) - ref[n] for c, n in zip(counts, names)])
    assert np.median(np.abs(deltas)) <= 12.0, deltas.tolist()
    assert np.abs(deltas).max() <= 40, deltas.tolist()
