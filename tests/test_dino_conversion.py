"""DINO ViT weight-conversion validation (VERDICT r2 next #8).

convert_dino_torch_params maps the facebookresearch/dino checkpoint layout
(the torch.hub model loaded by the reference's
tools/run_nearest_neighbours.py:292-295) onto our flax ViT. These tests
synthesize a full DINO-ViT-S/8-layout torch state dict and check:
(1) full key/shape coverage of our init tree, and
(2) our forward on converted weights == an independent torch evaluation of
    the same weights, implemented functionally from DINO's published
    vision_transformer.py semantics (pre-LN, fused qkv, CLS + pos embed).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lvc_tpu.modeling.backbone.vit import convert_dino_torch_params, dino_vits8

DEPTH, DIM, HEADS, PATCH = 12, 384, 6, 8


def _synth_dino_state_dict(seed=0):
    import torch

    g = torch.Generator().manual_seed(seed)

    def r(*shape, std=0.02):
        return torch.randn(*shape, generator=g) * std

    sd = {
        "cls_token": r(1, 1, DIM),
        "pos_embed": r(1, (224 // PATCH) ** 2 + 1, DIM),
        "patch_embed.proj.weight": r(DIM, 3, PATCH, PATCH),
        "patch_embed.proj.bias": r(DIM),
        "norm.weight": 1.0 + r(DIM),
        "norm.bias": r(DIM),
        # the hub checkpoint also carries the projection head; the
        # converter must ignore it (descriptors use the CLS token)
        "head.weight": r(65536, DIM),
    }
    for i in range(DEPTH):
        p = f"blocks.{i}."
        sd[p + "norm1.weight"] = 1.0 + r(DIM)
        sd[p + "norm1.bias"] = r(DIM)
        sd[p + "attn.qkv.weight"] = r(3 * DIM, DIM)
        sd[p + "attn.qkv.bias"] = r(3 * DIM)
        sd[p + "attn.proj.weight"] = r(DIM, DIM)
        sd[p + "attn.proj.bias"] = r(DIM)
        sd[p + "norm2.weight"] = 1.0 + r(DIM)
        sd[p + "norm2.bias"] = r(DIM)
        sd[p + "mlp.fc1.weight"] = r(4 * DIM, DIM)
        sd[p + "mlp.fc1.bias"] = r(4 * DIM)
        sd[p + "mlp.fc2.weight"] = r(DIM, 4 * DIM)
        sd[p + "mlp.fc2.bias"] = r(DIM)
    return sd


def _torch_dino_forward(sd, x_bchw):
    """Independent functional evaluation of the DINO ViT on a state dict
    (dino vision_transformer.py semantics: conv patch embed, CLS+pos,
    pre-LN blocks with fused qkv in (3, H, d) order, final LN, CLS out)."""
    import torch
    import torch.nn.functional as F

    with torch.no_grad():
        x = F.conv2d(
            x_bchw, sd["patch_embed.proj.weight"], sd["patch_embed.proj.bias"],
            stride=PATCH,
        )
        B, C, h, w = x.shape
        tokens = x.flatten(2).transpose(1, 2)  # (B, N, C)
        cls = sd["cls_token"].expand(B, -1, -1)
        tokens = torch.cat([cls, tokens], dim=1) + sd["pos_embed"]
        d = C // HEADS
        for i in range(DEPTH):
            p = f"blocks.{i}."
            y = F.layer_norm(tokens, (C,), sd[p + "norm1.weight"], sd[p + "norm1.bias"], 1e-6)
            qkv = y @ sd[p + "attn.qkv.weight"].T + sd[p + "attn.qkv.bias"]
            qkv = qkv.reshape(B, -1, 3, HEADS, d).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]  # (B, H, N, d)
            attn = (q @ k.transpose(-2, -1)) * d ** -0.5
            attn = attn.softmax(dim=-1)
            out = (attn @ v).transpose(1, 2).reshape(B, -1, C)
            tokens = tokens + out @ sd[p + "attn.proj.weight"].T + sd[p + "attn.proj.bias"]
            y = F.layer_norm(tokens, (C,), sd[p + "norm2.weight"], sd[p + "norm2.bias"], 1e-6)
            y = y @ sd[p + "mlp.fc1.weight"].T + sd[p + "mlp.fc1.bias"]
            y = F.gelu(y)
            y = y @ sd[p + "mlp.fc2.weight"].T + sd[p + "mlp.fc2.bias"]
            tokens = tokens + y
        tokens = F.layer_norm(tokens, (C,), sd["norm.weight"], sd["norm.bias"], 1e-6)
        return tokens[:, 0]


def test_convert_dino_covers_every_param():
    """Converted tree == our init tree in keys AND shapes (catches missing
    keys, stray keys, and transposes where in != out)."""
    from flax.traverse_util import flatten_dict

    sd = _synth_dino_state_dict()
    variables = convert_dino_torch_params(sd)
    model = dino_vits8()
    init = model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 224, 224, 3)))
    got = {k: np.asarray(v).shape for k, v in flatten_dict(variables["params"]).items()}
    want = {k: np.asarray(v).shape for k, v in flatten_dict(init["params"]).items()}
    assert got == want, (
        set(want) - set(got),
        set(got) - set(want),
        {k: (got[k], want[k]) for k in got if k in want and got[k] != want[k]},
    )


@pytest.mark.slow
def test_dino_forward_matches_torch_reference():
    import torch

    sd = _synth_dino_state_dict(seed=1)
    variables = convert_dino_torch_params(sd)

    rng = np.random.RandomState(2)
    img = rng.randn(2, 224, 224, 3).astype(np.float32)
    ref = _torch_dino_forward(sd, torch.from_numpy(img.transpose(0, 3, 1, 2)))

    model = dino_vits8()
    ours = model.apply(
        jax.tree_util.tree_map(jnp.asarray, variables), jnp.asarray(img)
    )
    np.testing.assert_allclose(
        np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-4
    )


@pytest.mark.slow
def test_build_dino_loads_torch_checkpoint(tmp_path):
    """The verifier weight path end-to-end: a .pth on disk -> build_dino
    returns converted variables whose forward matches torch."""
    import torch

    from lvc_tpu.pipeline.verification import build_dino

    sd = _synth_dino_state_dict(seed=3)
    path = tmp_path / "dino_vits8.pth"
    torch.save(sd, str(path))
    model, variables = build_dino("dino_vits8", weights_path=str(path))

    rng = np.random.RandomState(4)
    img = rng.randn(1, 224, 224, 3).astype(np.float32)
    ours = model.apply(jax.tree_util.tree_map(jnp.asarray, variables), jnp.asarray(img))
    ref = _torch_dino_forward(sd, torch.from_numpy(img.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-4)
