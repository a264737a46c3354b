"""Shared flax modules for the padded-graph models."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import jax

from camouflage_multimodal_tpu.ops.graph import masked_batch_stats


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over valid nodes of a padded node batch.

    Computes statistics over every position where ``mask`` is True — exactly
    the statistics torch's BatchNorm1d saw on the reference's block-diagonal
    PyG batches (all real nodes of all graphs, no padding). torch semantics:
    population variance for normalization, unbiased variance in the running
    estimate, running = (1-momentum)·running + momentum·batch.
    """

    features: int
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 use_running_average: bool) -> jnp.ndarray:
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(self.features, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(self.features, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean, var, n = masked_batch_stats(x, mask)
            if not self.is_initializing():
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased

        y = (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return jnp.where(mask[..., None], y, 0.0)
