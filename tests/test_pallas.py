"""Pallas fused-attention kernel parity with the jnp reference path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from camouflage_multimodal_tpu.ops.attention import init_mha_params, multihead_attention
from camouflage_multimodal_tpu.ops.pallas_attention import pallas_multihead_attention


@pytest.mark.parametrize("nq,nk", [(512, 16), (64, 13)])
def test_pallas_attention_matches_jnp(rng, nq, nk):
    B, E, H = 2, 256, 8
    q = jnp.asarray(rng.standard_normal((B, nq, E)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, nk, E)).astype(np.float32))
    mask = jnp.asarray(np.arange(nk)[None, :] < np.array([[nk - 3], [nk]]))
    params = init_mha_params(jax.random.PRNGKey(0), E)

    # jit everything: eager op-by-op dispatch pays ~35 ms tunnel RTT per op
    ref_out, ref_p = jax.jit(
        lambda p, q_, k_, m: multihead_attention(p, q_, k_, k_, H, key_mask=m)
    )(params, q, k, mask)
    interpret = jax.default_backend() != "tpu"
    got_out, got_p = jax.jit(
        lambda p, q_, k_, m: pallas_multihead_attention(
            p, q_, k_, k_, H, key_mask=m, interpret=interpret)
    )(params, q, k, mask)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(ref_p),
                               rtol=1e-3, atol=2e-3)


def test_fusion_model_pallas_flag_matches(rng):
    """MultimodalCamouflageDetector(use_pallas=True) must agree with the jnp
    path at inference."""
    if jax.default_backend() != "tpu":
        pytest.skip("compiled Pallas path needs TPU (jnp path covers CPU)")
    from camouflage_multimodal_tpu.models.fusion import MultimodalCamouflageDetector

    B, Nrg, Nkg = 2, 64, 13
    rg = jnp.asarray(rng.standard_normal((B, Nrg, 128)).astype(np.float32))
    kg = jnp.asarray(rng.standard_normal((B, Nkg, 128)).astype(np.float32))
    ref_model = MultimodalCamouflageDetector()
    pal_model = MultimodalCamouflageDetector(use_pallas=True)
    variables = jax.jit(ref_model.init)(jax.random.PRNGKey(0), rg, kg)
    ref = jax.jit(lambda v, a, b: ref_model.apply(v, a, b,
                                                  return_attention=True))(variables, rg, kg)
    got = jax.jit(lambda v, a, b: pal_model.apply(v, a, b,
                                                  return_attention=True))(variables, rg, kg)
    for k_ in ("mask_logits", "instance_logits", "edge_logits", "score"):
        np.testing.assert_allclose(np.asarray(got[k_]), np.asarray(ref[k_]),
                                   rtol=1e-4, atol=1e-4, err_msg=k_)
    np.testing.assert_allclose(np.asarray(got["attention"]["rg2kg"]),
                               np.asarray(ref["attention"]["rg2kg"]),
                               rtol=1e-3, atol=2e-3)


def test_pallas_slic_backend_agrees_with_xla(sample_image_paths):
    """The MXU distance-matmul assignment vs the 9-candidate gather path:
    same window semantics, so labels must agree up to float-tie breaking."""
    if jax.default_backend() != "tpu":
        pytest.skip("compiled Pallas path needs TPU")
    from camouflage_multimodal_tpu.data.cod10k import load_image_rgb
    from camouflage_multimodal_tpu.ops.slic import slic

    img = jnp.asarray(load_image_rgb(sample_image_paths[0], 128))
    a = np.asarray(slic(img, n_segments=128, num_iters=5))
    b = np.asarray(slic(img, n_segments=128, num_iters=5, backend="pallas"))
    assert (a == b).mean() > 0.995


def test_pallas_attention_grads_match_jnp(rng):
    """custom-VJP wrapper: grads through the fused kernel must match
    differentiating the jnp path (same f32-HIGHEST numerics)."""
    from camouflage_multimodal_tpu.ops.pallas_attention import (
        pallas_multihead_attention_trainable,
    )

    B, nq, nk, E, H = 2, 32, 13, 128, 8
    q = jnp.asarray(rng.standard_normal((B, nq, E)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, nk, E)).astype(np.float32))
    mask = jnp.asarray(np.arange(nk)[None, :] < np.array([[nk - 4], [nk]]))
    params = init_mha_params(jax.random.PRNGKey(1), E)

    def loss_pallas(p, q_, k_):
        out, probs = pallas_multihead_attention_trainable(p, q_, k_, k_, H, mask)
        return jnp.sum(out ** 2) + jnp.sum(probs * probs)

    def loss_jnp(p, q_, k_):
        out, probs = multihead_attention(p, q_, k_, k_, H, key_mask=mask)
        return jnp.sum(out ** 2) + jnp.sum(probs * probs)

    gp, gq, gk = jax.jit(jax.grad(loss_pallas, argnums=(0, 1, 2)))(params, q, k)
    rp, rq, rk = jax.jit(jax.grad(loss_jnp, argnums=(0, 1, 2)))(params, q, k)
    for got, ref in ((gq, rq), (gk, rk)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
    for name in gp:
        np.testing.assert_allclose(np.asarray(gp[name]), np.asarray(rp[name]),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_fusion_trains_through_pallas_when_dropout_zero(rng):
    """use_pallas + dropout=0 routes TRAINING through the fused kernel and
    still produces finite grads that step the loss down."""
    from camouflage_multimodal_tpu.models.fusion import MultimodalCamouflageDetector

    model = MultimodalCamouflageDetector(hidden_dim=64, num_heads=4,
                                         dropout=0.0, use_pallas=True)
    rgb = jnp.asarray(rng.standard_normal((2, 16, 128)).astype(np.float32))
    kgb = jnp.asarray(rng.standard_normal((2, 4, 128)).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), rgb, kgb)
    y = jnp.asarray([0, 1])

    def loss_fn(p):
        out = model.apply({"params": p}, rgb, kgb, train=True,
                          rngs={"dropout": jax.random.PRNGKey(2)})
        logp = jax.nn.log_softmax(out["mask_logits"])
        return -jnp.mean(logp[jnp.arange(2), y])

    loss_jit = jax.jit(loss_fn)
    l0, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    assert np.isfinite(float(l0))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))
    stepped = jax.jit(lambda ps, gs: jax.tree_util.tree_map(
        lambda p, g: p - 0.05 * g, ps, gs))(variables["params"], grads)
    l1 = loss_jit(stepped)
    assert float(l1) < float(l0)
