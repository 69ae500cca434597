"""Gradient decouple / affine layers (lvc/modeling/meta_arch/gdl.py:6-38)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


def decouple_layer(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Pass-through forward, gradient scaled by ``scale``
    (GradientDecoupleLayer)."""
    return x * scale + jax.lax.stop_gradient(x * (1.0 - scale))


class AffineLayer(nn.Module):
    """Channelwise learnable scale/bias (AffineLayer, gdl.py:19)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        out = x * weight
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + bias
        return out
