"""Parity tests for the dense masked GNN/attention stack.

Goldens: hand-computed torch-geometric math in numpy (GCN/GAT), real torch
modules with copied weights (BatchNorm1d, MultiheadAttention), and
padding-invariance checks (padded nodes must not influence valid outputs).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from camouflage_multimodal_tpu.models.fusion import MultimodalCamouflageDetector
from camouflage_multimodal_tpu.models.knowledge_graph import KnowledgeGraphGNN
from camouflage_multimodal_tpu.models.layers import MaskedBatchNorm
from camouflage_multimodal_tpu.models.region_graph import RegionGraphGNN
from camouflage_multimodal_tpu.ops.attention import init_mha_params, multihead_attention
from camouflage_multimodal_tpu.ops.graph import (
    gat_layer,
    gcn_layer,
    masked_mean_pool,
    normalize_adjacency,
)

from jithelp import japply, jcall, jinit


# ---------------------------------------------------------------------------
# GCN vs PyG math
# ---------------------------------------------------------------------------

def _np_gcn(x, adj_w, W, b):
    """torch_geometric GCNConv: D̂^-1/2 (A+I) D̂^-1/2 X W + b."""
    K = x.shape[0]
    a = adj_w + np.eye(K)
    d = a.sum(1)
    dinv = 1.0 / np.sqrt(d)
    an = dinv[:, None] * a * dinv[None, :]
    return an @ (x @ W) + b


def test_gcn_matches_pyg_math(rng):
    K, Cin, Cout = 6, 5, 4
    x = rng.random((K, Cin)).astype(np.float32)
    adj = np.zeros((K, K), dtype=np.float32)
    for i, j, w in [(0, 1, 0.5), (1, 2, 0.9), (3, 4, 0.2), (0, 5, 1.3)]:
        adj[i, j] = adj[j, i] = w
    W = rng.random((Cin, Cout)).astype(np.float32)
    b = rng.random(Cout).astype(np.float32)

    ref = _np_gcn(x, adj, W, b)
    mask = jnp.ones((K,), bool)
    got = np.asarray(jcall(
        lambda x_, a_, m_, W_, b_: gcn_layer(x_, normalize_adjacency(a_, m_), W_, b_),
        jnp.asarray(x), jnp.asarray(adj), mask, jnp.asarray(W), jnp.asarray(b)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def _np_gat(x, adj_bool, W, a_src, a_dst, b):
    """torch_geometric GATConv (heads, concat=False): softmax over senders
    j ∈ N(i) ∪ {i} of LeakyReLU(a_dst·Wx_i + a_src·Wx_j)."""
    K = x.shape[0]
    H, C = a_src.shape
    h = np.einsum("kc,chd->khd", x, W)
    asrc = np.einsum("khd,hd->kh", h, a_src)
    adst = np.einsum("khd,hd->kh", h, a_dst)
    allow = adj_bool | np.eye(K, dtype=bool)
    out = np.zeros((K, H, C))
    for i in range(K):
        js = np.nonzero(allow[i])[0]
        e = adst[i][None, :] + asrc[js]  # (nj, H)
        e = np.where(e > 0, e, 0.2 * e)
        alpha = np.exp(e - e.max(0)) / np.exp(e - e.max(0)).sum(0)
        out[i] = np.einsum("jh,jhd->hd", alpha, h[js])
    return out.mean(1) + b


def test_gat_matches_pyg_math(rng):
    K, Cin, H, C = 5, 7, 3, 4
    x = rng.random((K, Cin)).astype(np.float32)
    adj = np.zeros((K, K), dtype=bool)
    for i, j in [(0, 1), (1, 2), (2, 3), (0, 4)]:
        adj[i, j] = adj[j, i] = True
    W = rng.random((Cin, H, C)).astype(np.float32) - 0.5
    a_src = rng.random((H, C)).astype(np.float32) - 0.5
    a_dst = rng.random((H, C)).astype(np.float32) - 0.5
    b = rng.random(C).astype(np.float32)

    ref = _np_gat(x, adj, W, a_src, a_dst, b)
    got = np.asarray(jcall(
        gat_layer, jnp.asarray(x), jnp.asarray(adj), jnp.ones((K,), bool),
        jnp.asarray(W), jnp.asarray(a_src), jnp.asarray(a_dst), jnp.asarray(b)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_gcn_gat_padding_invariance(rng):
    """Adding padded nodes must not change outputs at valid nodes."""
    K, Kpad, Cin = 5, 9, 7
    x = rng.random((K, Cin)).astype(np.float32)
    adj = np.zeros((K, K), dtype=np.float32)
    adj[0, 1] = adj[1, 0] = 0.7
    adj[2, 3] = adj[3, 2] = 0.4
    W = rng.random((Cin, 4)).astype(np.float32)
    b = np.zeros(4, np.float32)

    gcn_norm = lambda x_, a_, m_, W_, b_: gcn_layer(  # noqa: E731
        x_, normalize_adjacency(a_, m_), W_, b_)
    m_small = jnp.ones((K,), bool)
    out_small = jcall(gcn_norm, jnp.asarray(x), jnp.asarray(adj), m_small,
                      jnp.asarray(W), jnp.asarray(b))

    xp = np.zeros((Kpad, Cin), np.float32)
    xp[:K] = x
    adjp = np.zeros((Kpad, Kpad), np.float32)
    adjp[:K, :K] = adj
    m_pad = jnp.asarray(np.arange(Kpad) < K)
    out_pad = jcall(gcn_norm, jnp.asarray(xp), jnp.asarray(adjp), m_pad,
                    jnp.asarray(W), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(out_pad)[:K], np.asarray(out_small), rtol=1e-5, atol=1e-6)

    Wg = rng.random((Cin, 2, 4)).astype(np.float32) - 0.5
    asrc = rng.random((2, 4)).astype(np.float32) - 0.5
    adst = rng.random((2, 4)).astype(np.float32) - 0.5
    g_small = jcall(gat_layer, jnp.asarray(x), jnp.asarray(adj > 0), m_small,
                    jnp.asarray(Wg), jnp.asarray(asrc), jnp.asarray(adst))
    g_pad = jcall(gat_layer, jnp.asarray(xp), jnp.asarray(adjp > 0), m_pad,
                  jnp.asarray(Wg), jnp.asarray(asrc), jnp.asarray(adst))
    np.testing.assert_allclose(np.asarray(g_pad)[:K], np.asarray(g_small), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# MaskedBatchNorm vs torch BatchNorm1d
# ---------------------------------------------------------------------------

def test_masked_batchnorm_matches_torch(rng):
    N, C = 20, 6
    x = rng.random((N, C)).astype(np.float32)

    tbn = torch.nn.BatchNorm1d(C)
    with torch.no_grad():
        tbn.weight.copy_(torch.rand(C))
        tbn.bias.copy_(torch.rand(C))
    tbn.train()
    ref_train = tbn(torch.tensor(x)).detach().numpy()

    bn = MaskedBatchNorm(C)
    params = {
        "params": {"scale": jnp.asarray(tbn.weight.detach().numpy()),
                   "bias": jnp.asarray(tbn.bias.detach().numpy())},
        "batch_stats": {"mean": jnp.zeros(C), "var": jnp.ones(C)},
    }
    got_train, updates = jcall(
        lambda v, x_, m_: bn.apply(v, x_, m_, False, mutable=["batch_stats"]),
        params, jnp.asarray(x), jnp.ones((N,), bool))
    np.testing.assert_allclose(np.asarray(got_train), ref_train, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(updates["batch_stats"]["mean"]),
                               tbn.running_mean.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(updates["batch_stats"]["var"]),
                               tbn.running_var.numpy(), rtol=1e-4, atol=1e-6)

    tbn.eval()
    ref_eval = tbn(torch.tensor(x)).detach().numpy()
    params["batch_stats"] = updates["batch_stats"]
    got_eval = jcall(lambda v, x_, m_: bn.apply(v, x_, m_, True),
                     params, jnp.asarray(x), jnp.ones((N,), bool))
    np.testing.assert_allclose(np.asarray(got_eval), ref_eval, rtol=1e-4, atol=1e-5)


def test_masked_batchnorm_ignores_padding(rng):
    N, P, C = 12, 5, 4
    x = rng.random((N + P, C)).astype(np.float32)
    mask = np.arange(N + P) < N
    bn = MaskedBatchNorm(C)
    params = {
        "params": {"scale": jnp.ones(C), "bias": jnp.zeros(C)},
        "batch_stats": {"mean": jnp.zeros(C), "var": jnp.ones(C)},
    }
    bn_train = lambda v, x_, m_: bn.apply(v, x_, m_, False,  # noqa: E731
                                          mutable=["batch_stats"])
    full, _ = jcall(bn_train, params, jnp.asarray(x[:N]), jnp.ones((N,), bool))
    padded, _ = jcall(bn_train, params, jnp.asarray(x), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(padded)[:N], np.asarray(full), rtol=1e-5, atol=1e-6)
    assert np.all(np.asarray(padded)[N:] == 0)


# ---------------------------------------------------------------------------
# MultiheadAttention vs torch
# ---------------------------------------------------------------------------

def test_multihead_attention_matches_torch(rng):
    B, Nq, Nk, E, H = 2, 7, 5, 16, 4
    q = rng.standard_normal((B, Nq, E)).astype(np.float32)
    k = rng.standard_normal((B, Nk, E)).astype(np.float32)

    tmha = torch.nn.MultiheadAttention(E, H, dropout=0.0, batch_first=True)
    tmha.eval()
    with torch.no_grad():
        out_ref, w_ref = tmha(torch.tensor(q), torch.tensor(k), torch.tensor(k),
                              need_weights=True, average_attn_weights=True)

    ipw = tmha.in_proj_weight.detach().numpy()  # (3E, E)
    ipb = tmha.in_proj_bias.detach().numpy()
    params = {
        "wq": jnp.asarray(ipw[:E].T), "bq": jnp.asarray(ipb[:E]),
        "wk": jnp.asarray(ipw[E:2 * E].T), "bk": jnp.asarray(ipb[E:2 * E]),
        "wv": jnp.asarray(ipw[2 * E:].T), "bv": jnp.asarray(ipb[2 * E:]),
        "wo": jnp.asarray(tmha.out_proj.weight.detach().numpy().T),
        "bo": jnp.asarray(tmha.out_proj.bias.detach().numpy()),
    }
    out, w = jcall(lambda p, q_, k_: multihead_attention(p, q_, k_, k_, num_heads=H),
                   params, jnp.asarray(q), jnp.asarray(k))
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w), w_ref.numpy(), rtol=1e-4, atol=1e-5)


def test_multihead_attention_key_padding_matches_torch(rng):
    B, Nq, Nk, E, H = 1, 4, 6, 8, 2
    q = rng.standard_normal((B, Nq, E)).astype(np.float32)
    k = rng.standard_normal((B, Nk, E)).astype(np.float32)
    valid = np.array([[True, True, True, False, False, False]])

    tmha = torch.nn.MultiheadAttention(E, H, dropout=0.0, batch_first=True)
    tmha.eval()
    with torch.no_grad():
        out_ref, w_ref = tmha(torch.tensor(q), torch.tensor(k), torch.tensor(k),
                              key_padding_mask=torch.tensor(~valid),
                              need_weights=True, average_attn_weights=True)
    E_ = E
    ipw = tmha.in_proj_weight.detach().numpy()
    ipb = tmha.in_proj_bias.detach().numpy()
    params = {
        "wq": jnp.asarray(ipw[:E_].T), "bq": jnp.asarray(ipb[:E_]),
        "wk": jnp.asarray(ipw[E_:2 * E_].T), "bk": jnp.asarray(ipb[E_:2 * E_]),
        "wv": jnp.asarray(ipw[2 * E_:].T), "bv": jnp.asarray(ipb[2 * E_:]),
        "wo": jnp.asarray(tmha.out_proj.weight.detach().numpy().T),
        "bo": jnp.asarray(tmha.out_proj.bias.detach().numpy()),
    }
    out, w = jcall(lambda p, q_, k_, m_: multihead_attention(
        p, q_, k_, k_, num_heads=H, key_mask=m_),
        params, jnp.asarray(q), jnp.asarray(k), jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w), w_ref.numpy(), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# End-to-end model smoke + invariances
# ---------------------------------------------------------------------------

def _random_graph_batch(rng, B, K, Cin, n_valid):
    x = rng.random((B, K, Cin)).astype(np.float32)
    adj = rng.random((B, K, K)) > 0.8
    adj = adj | adj.transpose(0, 2, 1)
    mask = np.zeros((B, K), bool)
    for b in range(B):
        mask[b, : n_valid[b]] = True
    adj = adj & mask[:, :, None] & mask[:, None, :]
    adj = adj & ~np.eye(K, dtype=bool)
    w = rng.random((B, K, K)).astype(np.float32) * adj
    w = (w + w.transpose(0, 2, 1)) / 2
    x *= mask[..., None]
    return jnp.asarray(x), jnp.asarray(adj), jnp.asarray(w), jnp.asarray(mask)


def test_region_graph_gnn_shapes_and_masking(rng):
    B, K = 2, 24
    x, adj, w, mask = _random_graph_batch(rng, B, K, 15, [20, 15])
    model = RegionGraphGNN()
    variables = jinit(model, jax.random.PRNGKey(0), x, adj, w, mask)
    out = japply(model, variables, x, adj, w, mask)
    assert out["mask_logits"].shape == (B, K, 2)
    assert out["instance_logits"].shape == (B, K, 2)
    assert out["edge_logits"].shape == (B, K, 1)
    assert out["node_embeddings"].shape == (B, K, 128)
    assert out["graph_embedding"].shape == (B, 128)
    # padded node embeddings are zeroed
    emb = np.asarray(out["node_embeddings"])
    assert np.all(emb[0, 20:] == 0)
    assert np.all(np.isfinite(np.asarray(out["mask_logits"]))), "NaN in logits"


def test_kg_gnn_shapes(rng):
    B, N = 3, 16
    x, adj, _, mask = _random_graph_batch(rng, B, N, 32, [10, 12, 8])
    model = KnowledgeGraphGNN()
    variables = jinit(model, jax.random.PRNGKey(0), x, adj, mask)
    out = japply(model, variables, x, adj, mask)
    assert out["score"].shape == (B, 1)
    assert out["embedding"].shape == (B, 128)


def test_fusion_model_shapes_and_attention(rng):
    """Mirrors the reference's smoke test (fusion_model.py:262-291)."""
    B, Nrg, Nkg = 4, 50, 13
    rg = jnp.asarray(rng.standard_normal((B, Nrg, 128)).astype(np.float32))
    kg = jnp.asarray(rng.standard_normal((B, Nkg, 128)).astype(np.float32))
    model = MultimodalCamouflageDetector()
    variables = jinit(model, jax.random.PRNGKey(0), rg, kg)
    out = japply(model, variables, rg, kg, return_attention=True)
    assert out["mask_logits"].shape == (B, 2)
    assert out["instance_logits"].shape == (B, 2)
    assert out["edge_logits"].shape == (B, 1)
    assert out["score"].shape == (B, 1)
    assert float(out["score"].min()) >= 0.0 and float(out["score"].max()) <= 1.0
    assert out["attention"]["rg2kg"].shape == (B, Nrg, Nkg)
    assert out["attention"]["kg2rg"].shape == (B, Nkg, Nrg)
    # attention rows are probability distributions
    np.testing.assert_allclose(np.asarray(out["attention"]["rg2kg"]).sum(-1), 1.0, atol=1e-5)


def test_fusion_model_padding_invariance(rng):
    B, Nrg, Nkg, pad = 1, 20, 13, 12
    rg = rng.standard_normal((B, Nrg, 128)).astype(np.float32)
    kg = rng.standard_normal((B, Nkg, 128)).astype(np.float32)
    model = MultimodalCamouflageDetector()
    variables = jinit(model, jax.random.PRNGKey(0), jnp.asarray(rg), jnp.asarray(kg))
    out_small = japply(model, variables, jnp.asarray(rg), jnp.asarray(kg))

    rg_pad = np.concatenate([rg, np.zeros((B, pad, 128), np.float32)], axis=1)
    rg_mask = jnp.asarray(np.arange(Nrg + pad)[None] < Nrg)
    out_pad = jcall(lambda v, r_, k_, m_: model.apply(v, r_, k_, rg_mask=m_),
                    variables, jnp.asarray(rg_pad), jnp.asarray(kg), rg_mask)
    for k in ("mask_logits", "instance_logits", "edge_logits", "score"):
        np.testing.assert_allclose(np.asarray(out_pad[k]), np.asarray(out_small[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)


def test_late_fusion_variant(rng):
    rg = jnp.asarray(rng.standard_normal((2, 10, 128)).astype(np.float32))
    kg = jnp.asarray(rng.standard_normal((2, 1, 128)).astype(np.float32))
    model = MultimodalCamouflageDetector(fusion_type="late")
    variables = jinit(model, jax.random.PRNGKey(0), rg, kg)
    out = japply(model, variables, rg, kg)
    assert out["mask_logits"].shape == (2, 2)
