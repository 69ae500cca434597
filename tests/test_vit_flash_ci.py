"""CI coverage for the ViT serving deviations (VERDICT r4 next #4).

The TPU serving default is the Pallas flash-attention path
(`vit.py _flash_mha`, `attn_impl="auto"` -> flash on TPU) — but CPU CI
always took the einsum branch, leaving the pad/transpose/SegmentIds/slice
plumbing untested. These tests drive `_flash_mha` with an injected
reference attention implementing the flash kernel's SegmentIds contract,
so a regression in the plumbing turns this tier red; the kernel itself is
quantified on chip by `scripts/check_vit_flash.py` (`make check-tpu`).

Reference semantics: the einsum branch of
`lvc_tpu/modeling/backbone/vit.py` (Attention.__call__), which mirrors
the reference's torch.hub DINO attention
(/root/reference/tools/run_nearest_neighbours.py:292-295 loads it).
"""
import numpy as np
import jax
import jax.numpy as jnp


def _ref_attn(q, k, v, segment_ids, sm_scale):
    """Dense attention with the flash kernel's SegmentIds semantics:
    queries attend only keys in the same segment. q/k/v: (B, H, N, d)."""
    scores = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32) * sm_scale
    if segment_ids is not None:
        same = segment_ids.q[:, None, :, None] == segment_ids.kv[:, None, None, :]
        scores = jnp.where(same, scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v)


def _einsum_attention(qkv, scale):
    """The einsum branch's math, lifted verbatim for comparison."""
    B, N, _, H, d = qkv.shape
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, d)
    attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, H * d)


def test_flash_mha_plumbing_matches_einsum_padded():
    """N=785 (the 224-crop DINO shape class, pads 785->896): the
    pad/transpose/SegmentIds/slice wrapper around the attention callable
    must reproduce the einsum branch exactly."""
    from lvc_tpu.modeling.backbone.vit import _flash_mha

    rng = np.random.RandomState(0)
    B, N, H, d = 2, 85, 6, 64  # same pad class behaviour (85 -> 128)
    qkv = jnp.asarray(rng.randn(B, N, 3, H, d).astype(np.float32) * 0.3)
    scale = d ** -0.5
    got = _flash_mha(qkv, scale, attn_fn=_ref_attn)
    want = _einsum_attention(qkv, scale)
    assert got.shape == want.shape == (B, N, H * d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_mha_plumbing_no_pad():
    """N already a multiple of 128: no SegmentIds are built and nothing
    is sliced."""
    from lvc_tpu.modeling.backbone.vit import _flash_mha

    seen = {}

    def spy(q, k, v, segment_ids, sm_scale):
        seen["seg"] = segment_ids
        seen["n"] = q.shape[2]
        return _ref_attn(q, k, v, segment_ids, sm_scale)

    rng = np.random.RandomState(1)
    B, N, H, d = 1, 128, 2, 32
    qkv = jnp.asarray(rng.randn(B, N, 3, H, d).astype(np.float32) * 0.3)
    scale = d ** -0.5
    got = _flash_mha(qkv, scale, attn_fn=spy)
    want = _einsum_attention(qkv, scale)
    assert seen["seg"] is None and seen["n"] == N
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_mha_pad_tokens_do_not_leak():
    """The pad segment must not influence real tokens: perturbing what the
    attention sees at pad positions (segment 1) must not change the
    sliced-off output. This is exactly the property SegmentIds masking
    provides on TPU."""
    from lvc_tpu.modeling.backbone.vit import _flash_mha

    rng = np.random.RandomState(2)
    B, N, H, d = 1, 100, 2, 32
    qkv = jnp.asarray(rng.randn(B, N, 3, H, d).astype(np.float32) * 0.3)
    scale = d ** -0.5

    def poisoned(q, k, v, segment_ids, sm_scale):
        # overwrite pad-position K/V with garbage BEFORE the masked
        # attention: masking must make it unobservable
        ids = segment_ids.kv  # (B, Np)
        garb = jnp.where(ids[:, None, :, None] == 1, 1e3, k)
        garbv = jnp.where(ids[:, None, :, None] == 1, -1e3, v)
        return _ref_attn(q, garb, garbv, segment_ids, sm_scale)

    got = _flash_mha(qkv, scale, attn_fn=poisoned)
    want = _flash_mha(qkv, scale, attn_fn=_ref_attn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_vit_large_sequence_falls_back_to_einsum():
    """ADVICE r4: attn_impl='auto'/'flash' must not hand sequences past
    the VMEM-scoped block limit to the full-sequence flash kernel."""
    from lvc_tpu.modeling.backbone import vit as vit_mod

    calls = {"flash": 0}
    orig = vit_mod._flash_mha

    def counting(qkv, scale, attn_fn=None):
        calls["flash"] += 1
        return orig(qkv, scale, attn_fn=attn_fn)

    vit_mod._flash_mha = counting
    try:
        model = vit_mod.VisionTransformer(
            patch_size=8, embed_dim=64, depth=1, num_heads=2,
            img_size=320, attn_impl="flash",
        )
        x = jnp.zeros((1, 320, 320, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        # (320/8)^2 + 1 = 1601 -> pads past 1280: einsum fallback, no
        # flash calls
        assert calls["flash"] == 0
        assert out.shape == (1, 64)
    finally:
        vit_mod._flash_mha = orig
