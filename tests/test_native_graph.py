"""Cross-check: the C++ host graph-builder vs the JAX device kernels.

Two independent implementations of the same algorithms (SLIC, Canny,
features, RAG) must agree — a strong correctness argument for both.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from camouflage_multimodal_tpu import native


@pytest.fixture(scope="module")
def built(sample_image_paths):
    if native.get_graph_lib() is None:
        pytest.skip("native graph builder unavailable")
    from camouflage_multimodal_tpu.data.cod10k import load_image_rgb

    img = load_image_rgb(sample_image_paths[0], 128)
    return img, native.build_region_graph(img, n_segments=128, max_nodes=256,
                                          num_iters=6)


def test_native_slic_agrees_with_jax(built):
    from camouflage_multimodal_tpu.ops.slic import slic

    img, out = built
    seg_jax = np.asarray(slic(jnp.asarray(img), n_segments=128, num_iters=6))
    agree = (seg_jax == out["segments"]).mean()
    assert agree > 0.97, f"SLIC agreement {agree:.3f}"


def test_native_canny_agrees_with_jax(built):
    from camouflage_multimodal_tpu.ops.canny import canny
    from camouflage_multimodal_tpu.ops.image import rgb_to_gray

    img, out = built
    e_jax = np.asarray(canny(rgb_to_gray(jnp.asarray(img)), sigma=2.0))
    e_nat = out["canny"]
    union = (e_jax | e_nat).sum()
    if union == 0:
        pytest.skip("no edges in sample")
    iou = (e_jax & e_nat).sum() / union
    assert iou > 0.95, f"canny IoU {iou:.3f}"


def test_native_features_agree_with_jax(built):
    """Features must match wherever both implementations produced the same
    segment geometry (≥97% of pixels agree, so most regions are identical)."""
    from camouflage_multimodal_tpu.ops.regions import region_features

    img, out = built
    seg = jnp.asarray(out["segments"])  # same segmentation for both
    edges = jnp.asarray(out["canny"])
    jax_out = region_features(jnp.asarray(img), seg, edges, 256)
    f_jax = np.asarray(jax_out["features"])
    f_nat = out["features"]
    mask = out["node_mask"] & np.asarray(jax_out["node_mask"])
    np.testing.assert_allclose(f_nat[mask], f_jax[mask], rtol=5e-3, atol=5e-4)


def test_native_rag_agrees_with_jax(built):
    from camouflage_multimodal_tpu.ops.rag import rag_edge_weights, region_adjacency
    from camouflage_multimodal_tpu.ops.regions import region_features

    img, out = built
    seg = jnp.asarray(out["segments"])
    adj = region_adjacency(seg, 256)
    jax_feats = region_features(jnp.asarray(img), seg, jnp.asarray(out["canny"]), 256)
    w_jax = np.asarray(rag_edge_weights(jax_feats["features"], adj))
    w_nat = out["edge_weights"]
    same_support = (w_jax > 0) == (w_nat > 0)
    assert same_support.mean() > 0.999
    both = (w_jax > 0) & (w_nat > 0)
    np.testing.assert_allclose(w_nat[both], w_jax[both], rtol=5e-3, atol=1e-4)
