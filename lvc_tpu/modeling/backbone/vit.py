"""Vision Transformer (DINO ViT-S/8 style) for the label verifier.

The reference loads DINO via torch.hub
(tools/run_nearest_neighbours.py:292-295) and uses the CLS embedding of
224x224 crops as the descriptor. This is a from-scratch flax ViT with the
same architecture (patch 8, dim 384, depth 12, heads 6, mlp 4x, pre-LN) and
a converter for the public DINO torch checkpoints.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp
import flax.linen as nn


class Mlp(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        from lvc_tpu.modeling.layers import get_compute_dtype

        dt = get_compute_dtype()
        x = nn.Dense(self.hidden, dtype=dt, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out, dtype=dt, name="fc2")(x)
        return x


def _flash_mha(qkv, scale, attn_fn=None):
    """Fused attention via the Pallas TPU flash kernel, N padded to a
    multiple of 128 with SegmentIds masking (pad tokens get segment 1 and
    can only attend each other; their output is sliced off).

    ``attn_fn(q, k, v, segment_ids, sm_scale)`` is injectable so the
    pad/transpose/SegmentIds/slice plumbing is unit-testable on CPU
    against a reference attention (tests/test_vit_flash_ci.py); the
    default is the Pallas TPU flash kernel.

    Why: at N=785 the einsum form materializes the (B, H, N, N) attention
    tensor several times — ~2.4 ms/block of HBM traffic at batch 64 that
    ALSO blows the activation footprint (947 MB f32/block: observed to
    spill host-side and cost seconds/batch, docs/PERF.md round 4); the
    flash kernel keeps the softmax online in VMEM. The whole qkv tensor
    is relaid in ONE transpose+pad pass (separate per-tensor transposes
    measured ~1.3 ms/block in slices+copies). qkv: (B, N, 3, H, d) ->
    (B, N, H*d)."""
    import jax
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    B, N, _, H, d = qkv.shape
    Np = ((N + 127) // 128) * 128
    pad = Np - N
    qkvt = jnp.transpose(qkv, (2, 0, 3, 1, 4))  # (3, B, H, N, d)
    if pad:
        qkvt = jnp.pad(qkvt, ((0, 0),) * 3 + ((0, pad), (0, 0)))
    qp, kp, vp = qkvt[0], qkvt[1], qkvt[2]
    seg = None
    if pad:
        ids = (jnp.arange(Np) >= N).astype(jnp.int32)[None].repeat(B, axis=0)
        seg = SegmentIds(q=ids, kv=ids)
    if attn_fn is None:
        # full-sequence blocks: at N~896, d=64 the kernel is overhead-bound
        # with small blocks (round-4 sweep: 128-blocks 4.9 ms/call,
        # 896-blocks 3.96 ms/call, and block sizes must be multiples of
        # 128); one program per (batch, head) keeps the whole row in VMEM
        block = Np
        sizes = BlockSizes(
            block_q=block, block_k_major=block, block_k=block, block_b=1
        )

        def attn_fn(q, k, v, segment_ids, sm_scale):
            return flash_attention(
                q, k, v, segment_ids=segment_ids, sm_scale=sm_scale,
                block_sizes=sizes,
            )

    out = attn_fn(qp, kp, vp, seg, scale)
    if pad:
        out = out[:, :, :N]
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(B, N, H * d)


class Attention(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = True
    # "auto": flash kernel on TPU, einsum elsewhere. The einsum form is
    # the reference semantics (f32 softmax); flash computes the same
    # softmax online in f32 accumulators — descriptor deviation quantified
    # by scripts/check_vit_flash.py.
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x):
        import jax

        from lvc_tpu.modeling.layers import get_compute_dtype

        dt = get_compute_dtype()
        B, N, C = x.shape
        H = self.num_heads
        head_dim = C // H
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=dt, name="qkv")(x)
        # (B, N, 3, H, d) split without materialized transposes; einsum lets
        # XLA pick layouts for the attention contractions
        qkv = qkv.reshape(B, N, 3, H, head_dim)
        impl = self.attn_impl
        if impl == "auto":
            impl = "flash" if jax.default_backend() == "tpu" else "einsum"
        # _flash_mha runs full-sequence blocks, whose (block_q, block_k)
        # scratch grows as N^2: fine at the 224-crop verifier's N=896
        # (~3.2 MB) but past ~N=1280 it exceeds the 16 MB VMEM scope and
        # fails to compile (ADVICE r4). Larger ViTs take the einsum path.
        if impl == "flash" and ((N + 127) // 128) * 128 > 1280:
            impl = "einsum"
        if impl == "flash":
            out = _flash_mha(qkv, head_dim ** -0.5)
        else:
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, d)
            attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (head_dim ** -0.5)
            # softmax in f32 for numerical stability under bf16 compute
            attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, C)
        return nn.Dense(C, dtype=dt, name="proj")(out)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x):
        x = x + Attention(
            self.dim, self.num_heads, attn_impl=self.attn_impl, name="attn"
        )(
            nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        )
        x = x + Mlp(int(self.dim * self.mlp_ratio), self.dim, name="mlp")(
            nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        )
        return x


class VisionTransformer(nn.Module):
    patch_size: int = 8
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    img_size: int = 224
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, H, W, 3) -> CLS embeddings (B, embed_dim)."""
        B = x.shape[0]
        x = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            name="patch_embed",
        )(x)
        h, w = x.shape[1], x.shape[2]
        x = x.reshape(B, h * w, self.embed_dim)

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.embed_dim))
        n_patches = (self.img_size // self.patch_size) ** 2
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, n_patches + 1, self.embed_dim)
        )
        pos_cls, pos_patch = pos[:, :1], pos[:, 1:]
        if h * w != n_patches:
            # bicubic-ish interpolation of the patch position grid
            side = int(np.sqrt(n_patches))
            import jax

            grid = pos_patch.reshape(1, side, side, self.embed_dim)
            grid = jax.image.resize(grid, (1, h, w, self.embed_dim), method="bicubic")
            pos_patch = grid.reshape(1, h * w, self.embed_dim)
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.embed_dim)), x], axis=1)
        x = x + jnp.concatenate([pos_cls, pos_patch], axis=1)

        for i in range(self.depth):
            x = Block(
                self.embed_dim, self.num_heads, self.mlp_ratio,
                attn_impl=self.attn_impl, name=f"blocks.{i}",
            )(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        return x[:, 0]


def dino_vits8(attn_impl: str = "auto") -> VisionTransformer:
    return VisionTransformer(
        patch_size=8, embed_dim=384, depth=12, num_heads=6, attn_impl=attn_impl
    )


def dino_vits16(attn_impl: str = "auto") -> VisionTransformer:
    return VisionTransformer(
        patch_size=16, embed_dim=384, depth=12, num_heads=6, attn_impl=attn_impl
    )


def convert_dino_torch_params(state_dict) -> Dict:
    """Map a DINO torch checkpoint (facebookresearch/dino layout) onto the
    flax tree above."""
    import numpy as np

    def t(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    p: Dict = {}

    def put(path, v):
        d = p
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = v

    for key, v in state_dict.items():
        v = t(v)
        if key == "cls_token":
            put(("cls_token",), v)
        elif key == "pos_embed":
            put(("pos_embed",), v)
        elif key == "patch_embed.proj.weight":
            put(("patch_embed", "kernel"), v.transpose(2, 3, 1, 0))
        elif key == "patch_embed.proj.bias":
            put(("patch_embed", "bias"), v)
        elif key == "norm.weight":
            put(("norm", "scale"), v)
        elif key == "norm.bias":
            put(("norm", "bias"), v)
        elif key.startswith("blocks."):
            parts = key.split(".")
            blk = f"blocks.{parts[1]}"
            rest = parts[2:]
            if rest[0] in ("norm1", "norm2"):
                name = "scale" if rest[1] == "weight" else "bias"
                put((blk, rest[0], name), v)
            elif rest[0] == "attn":
                sub = rest[1]  # qkv or proj
                if rest[2] == "weight":
                    put((blk, "attn", sub, "kernel"), v.T)
                else:
                    put((blk, "attn", sub, "bias"), v)
            elif rest[0] == "mlp":
                sub = rest[1]  # fc1/fc2
                if rest[2] == "weight":
                    put((blk, "mlp", sub, "kernel"), v.T)
                else:
                    put((blk, "mlp", sub, "bias"), v)
        # head.* (projection heads) are not used for descriptors
    return {"params": p}
