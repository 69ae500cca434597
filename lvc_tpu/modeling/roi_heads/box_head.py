"""Box feature-extraction head.

Counterpart of lvc/modeling/roi_heads/box_head.py (FastRCNNConvFCHead:19):
N convs then M fcs with dropout after each fc's relu — the DROPOUT: 0.5
finetune trick (box_head.py:70,90-92).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from lvc_tpu.modeling.layers import Conv2d, get_compute_dtype


class FastRCNNConvFCHead(nn.Module):
    num_conv: int = 0
    conv_dim: int = 256
    num_fc: int = 2
    fc_dim: int = 1024
    norm: str = ""
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        """x: (N, P, P, C) pooled features -> (N, fc_dim)."""
        for k in range(self.num_conv):
            x = Conv2d(
                self.conv_dim,
                kernel_size=3,
                padding=1,
                use_bias=(self.norm == ""),
                norm=self.norm,
                activation=nn.relu,
                name=f"conv{k + 1}",
            )(x)
        if self.num_fc:
            # flatten in torch NCHW order so converted fc weights line up:
            # torch flattens (C, H, W); our layout is (H, W, C).
            n = x.shape[0]
            x = x.transpose(0, 3, 1, 2).reshape(n, -1)
            for k in range(self.num_fc):
                x = nn.relu(
                    nn.Dense(self.fc_dim, dtype=get_compute_dtype(), name=f"fc{k + 1}")(x)
                )
                if self.dropout > 0:
                    x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x
