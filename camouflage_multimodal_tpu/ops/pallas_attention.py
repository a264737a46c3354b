"""Pallas fused cross-attention kernel (TPU inference path).

Fuses the whole multi-head attention of the fusion model — QKV projections,
scaled logits, key-masked softmax, value contraction, head merge, output
projection, and the head-averaged probability map the API exposes — into one
VMEM-resident kernel per batch element.  At the reference's shapes
(Nq ≤ 512 RG nodes × Nk ≤ 16 KG categories, E = 256) every operand fits in
VMEM comfortably (< 2 MB), so the kernel needs no K/V streaming: it is a
single-block flash-style kernel whose wins come from fusion (one HBM
round-trip for q/k/v instead of ~8 intermediate tensors).

Numerics match :func:`camouflage_multimodal_tpu.ops.attention.multihead_attention`
(same parameter layout; validated in tests via interpret mode on CPU and on
real TPU by the integration suite).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _mha_kernel(num_heads: int, q_ref, k_ref, v_ref, mask_ref,
                wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                wo_ref, bo_ref, out_ref, probs_ref):
    """One batch element: q (Nq, E), k/v (Nk, E), mask (1, Nk)."""
    E = q_ref.shape[-1]
    Nq = q_ref.shape[0]
    Nk = k_ref.shape[0]
    hd = E // num_heads
    scale = 1.0 / (hd ** 0.5)

    hi = jax.lax.Precision.HIGHEST  # keep f32 MXU passes: parity with the jnp path
    q = jnp.dot(q_ref[:], wq_ref[:], preferred_element_type=jnp.float32, precision=hi) + bq_ref[:]
    k = jnp.dot(k_ref[:], wk_ref[:], preferred_element_type=jnp.float32, precision=hi) + bk_ref[:]
    v = jnp.dot(v_ref[:], wv_ref[:], preferred_element_type=jnp.float32, precision=hi) + bv_ref[:]

    key_valid = mask_ref[0, :]  # (Nk,)
    probs_acc = jnp.zeros((Nq, Nk), jnp.float32)
    ctx_heads = []

    for h in range(num_heads):
        qh = q[:, h * hd:(h + 1) * hd] * scale
        kh = k[:, h * hd:(h + 1) * hd]
        vh = v[:, h * hd:(h + 1) * hd]
        logits = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (Nq, Nk)
        logits = jnp.where(key_valid[None, :], logits, _NEG_INF)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        probs_acc = probs_acc + p
        ctx_heads.append(jnp.dot(p, vh, preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST))

    ctx = jnp.concatenate(ctx_heads, axis=-1)
    out_ref[:] = jnp.dot(ctx, wo_ref[:], preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST) + bo_ref[:]
    probs_ref[:] = probs_acc / num_heads


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def pallas_multihead_attention(
    params: Dict[str, jnp.ndarray],
    query: jnp.ndarray,      # (B, Nq, E)
    key: jnp.ndarray,        # (B, Nk, E)
    value: jnp.ndarray,      # (B, Nk, E)
    num_heads: int,
    key_mask: jnp.ndarray,   # (B, Nk) bool
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused MHA; returns (output (B, Nq, E), avg probs (B, Nq, Nk))."""
    B, Nq, E = query.shape
    Nk = key.shape[1]

    kernel = functools.partial(_mha_kernel, num_heads)

    def one(q, k, v, m):
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((Nq, E), jnp.float32),
                jax.ShapeDtypeStruct((Nq, Nk), jnp.float32),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 12,
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            interpret=interpret,
        )(q, k, v, m[None, :],
          params["wq"], params["bq"][None, :], params["wk"], params["bk"][None, :],
          params["wv"], params["bv"][None, :], params["wo"], params["bo"][None, :])

    out, probs = jax.vmap(one)(query.astype(jnp.float32), key.astype(jnp.float32),
                               value.astype(jnp.float32), key_mask)
    return out, probs


# ---------------------------------------------------------------------------
# Differentiable wrapper: Pallas forward + exact VJP.
#
# The backward recomputes the attention intermediates from the (q, k, v,
# params) residuals via the jnp reference path (ops/attention.py) — the
# flash-attention recomputation strategy — so the fused kernel is usable
# under jax.grad. Gradients are bit-identical to differentiating the jnp
# path (both run f32 HIGHEST matmuls) because the primal outputs match.
# Note: no attention-probs dropout inside the kernel — callers that train
# with attention dropout (the reference default) keep the jnp path.
# ---------------------------------------------------------------------------


def _default_interpret() -> bool:
    """Interpret mode off TPU so the grad-capable path runs under the forced
    CPU test platform too."""
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def pallas_multihead_attention_trainable(params, query, key, value,
                                         num_heads, key_mask):
    """Grad-capable fused MHA: Pallas forward, analytic recompute backward."""
    return pallas_multihead_attention(params, query, key, value, num_heads,
                                      key_mask, interpret=_default_interpret())


def _pallas_mha_fwd(params, query, key, value, num_heads, key_mask):
    out = pallas_multihead_attention(params, query, key, value, num_heads,
                                     key_mask, interpret=_default_interpret())
    return out, (params, query, key, value, key_mask)


def _pallas_mha_bwd(num_heads, residuals, cotangents):
    from camouflage_multimodal_tpu.ops.attention import multihead_attention

    params, query, key, value, key_mask = residuals
    _, vjp = jax.vjp(
        lambda p, q, k, v: multihead_attention(p, q, k, v, num_heads,
                                               key_mask=key_mask),
        params, query, key, value)
    d_params, d_q, d_k, d_v = vjp(cotangents)
    return d_params, d_q, d_k, d_v, None  # mask is non-differentiable


pallas_multihead_attention_trainable.defvjp(_pallas_mha_fwd, _pallas_mha_bwd)
