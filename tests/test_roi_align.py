"""RoIAlign parity vs a direct numpy port of the reference CPU kernel
semantics (ROIAlign_cpu.cpp) written independently here as the test oracle."""
import pytest

# full-model compiles: deselect with -m "not slow"
pytestmark = pytest.mark.slow

import math

import numpy as np
import jax.numpy as jnp

from lvc_tpu.ops.roi_align import (
    multilevel_roi_align,
    assign_boxes_to_levels,
)


def roi_align_reference(feat_hwc, box, spatial_scale, pooled, sampling_ratio, aligned=True):
    H, W, C = feat_hwc.shape
    offset = 0.5 if aligned else 0.0
    x0 = box[0] * spatial_scale - offset
    y0 = box[1] * spatial_scale - offset
    x1 = box[2] * spatial_scale - offset
    y1 = box[3] * spatial_scale - offset
    roi_w = x1 - x0
    roi_h = y1 - y0
    if not aligned:
        roi_w = max(roi_w, 1.0)
        roi_h = max(roi_h, 1.0)
    bin_h = roi_h / pooled
    bin_w = roi_w / pooled
    gh = sampling_ratio if sampling_ratio > 0 else int(math.ceil(roi_h / pooled))
    gw = sampling_ratio if sampling_ratio > 0 else int(math.ceil(roi_w / pooled))
    count = max(gh * gw, 1)
    out = np.zeros((pooled, pooled, C), np.float32)

    def bilinear(y, x):
        if y < -1.0 or y > H or x < -1.0 or x > W:
            return np.zeros(C, np.float32)
        y = max(y, 0.0)
        x = max(x, 0.0)
        y_low = int(y)
        x_low = int(x)
        if y_low >= H - 1:
            y_high = y_low = H - 1
            y = float(y_low)
        else:
            y_high = y_low + 1
        if x_low >= W - 1:
            x_high = x_low = W - 1
            x = float(x_low)
        else:
            x_high = x_low + 1
        ly, lx = y - y_low, x - x_low
        hy, hx = 1 - ly, 1 - lx
        return (
            hy * hx * feat_hwc[y_low, x_low]
            + hy * lx * feat_hwc[y_low, x_high]
            + ly * hx * feat_hwc[y_high, x_low]
            + ly * lx * feat_hwc[y_high, x_high]
        )

    for ph in range(pooled):
        for pw in range(pooled):
            acc = np.zeros(C, np.float32)
            for iy in range(max(gh, 1)):
                yy = y0 + ph * bin_h + (iy + 0.5) * bin_h / max(gh, 1)
                for ix in range(max(gw, 1)):
                    xx = x0 + pw * bin_w + (ix + 0.5) * bin_w / max(gw, 1)
                    acc += bilinear(yy, xx)
            out[ph, pw] = acc / count
    return out


def test_single_level_fixed_sampling():
    rng = np.random.RandomState(0)
    feat = rng.rand(16, 24, 5).astype(np.float32)
    boxes = np.array(
        [
            [4.0, 4.0, 60.0, 40.0],
            [0.0, 0.0, 95.0, 63.0],
            [10.5, 7.25, 30.0, 20.0],
        ],
        np.float32,
    )
    got = np.asarray(
        multilevel_roi_align([jnp.asarray(feat)], jnp.asarray(boxes), (4,), output_size=7, sampling_ratio=2)
    )
    for i, b in enumerate(boxes):
        ref = roi_align_reference(feat, b, 0.25, 7, 2)
        np.testing.assert_allclose(got[i], ref, rtol=1e-4, atol=1e-5)


def test_single_level_adaptive_sampling():
    rng = np.random.RandomState(1)
    feat = rng.rand(32, 32, 3).astype(np.float32)
    # boxes sized so ceil(bin) is 1, 2, 3 respectively at scale 1
    boxes = np.array(
        [
            [2.0, 2.0, 8.0, 8.0],       # bin ~0.86 -> grid 1
            [1.0, 1.0, 12.0, 12.0],     # bin ~1.6 -> grid 2
            [0.0, 0.0, 20.0, 15.0],     # grid 3 x 3 (w), 3 (h: 15/7->3)
        ],
        np.float32,
    )
    got = np.asarray(
        multilevel_roi_align([jnp.asarray(feat)], jnp.asarray(boxes), (1,), output_size=7, sampling_ratio=0)
    )
    for i, b in enumerate(boxes):
        ref = roi_align_reference(feat, b, 1.0, 7, 0)
        np.testing.assert_allclose(got[i], ref, rtol=1e-4, atol=1e-5)


def test_out_of_bounds_samples_zero():
    feat = np.ones((8, 8, 1), np.float32)
    # box hanging off the left/top: some samples < -1 contribute zeros
    boxes = np.array([[-16.0, -16.0, 16.0, 16.0]], np.float32)
    got = np.asarray(
        multilevel_roi_align([jnp.asarray(feat)], jnp.asarray(boxes), (1,), output_size=4, sampling_ratio=2)
    )
    ref = roi_align_reference(feat, boxes[0], 1.0, 4, 2)
    np.testing.assert_allclose(got[0], ref, rtol=1e-5)


def test_level_assignment():
    # canonical: 224-sized box -> level 4; FPN p2..p5 => min_level 2, max 5
    boxes = jnp.asarray(
        np.array(
            [
                [0, 0, 224, 224],   # -> level 4
                [0, 0, 112, 112],   # -> level 3
                [0, 0, 448, 448],   # -> level 5
                [0, 0, 20, 20],     # tiny -> clamp to 2
                [0, 0, 4000, 4000], # huge -> clamp to 5
            ],
            np.float32,
        )
    )
    lv = np.asarray(assign_boxes_to_levels(boxes, 2, 5, 224, 4))
    assert lv.tolist() == [2, 1, 3, 0, 3]


def test_batched_matches_single_image():
    from lvc_tpu.ops.roi_align import batched_multilevel_roi_align

    rng = np.random.RandomState(7)
    B = 3
    feats = [
        rng.rand(B, 16, 16, 4).astype(np.float32),
        rng.rand(B, 8, 8, 4).astype(np.float32),
    ]
    strides = (4, 8)
    boxes = rng.rand(B, 5, 4).astype(np.float32) * 30
    boxes[..., 2:] += boxes[..., :2] + 4
    got = np.asarray(
        batched_multilevel_roi_align(
            [jnp.asarray(f) for f in feats], jnp.asarray(boxes), strides,
            output_size=7, sampling_ratio=0, max_grid=2, min_level=2, chunk=4,
        )
    )
    for b in range(B):
        ref = np.asarray(
            multilevel_roi_align(
                [jnp.asarray(f[b]) for f in feats], jnp.asarray(boxes[b]), strides,
                output_size=7, sampling_ratio=0, max_grid=2, min_level=2,
            )
        )
        np.testing.assert_allclose(got[b], ref, rtol=1e-5, atol=1e-6)


def test_multilevel_matches_single_level_choice():
    rng = np.random.RandomState(3)
    feats = [rng.rand(32, 32, 4).astype(np.float32), rng.rand(16, 16, 4).astype(np.float32)]
    strides = (4, 8)
    boxes = np.array(
        [
            [0.0, 0.0, 60.0, 50.0],    # sqrt(3000)=54 -> level 2 (first)
            [0.0, 0.0, 120.0, 110.0],  # sqrt(13200)=115 -> level 3 (second)
        ],
        np.float32,
    )
    got = np.asarray(
        multilevel_roi_align(
            [jnp.asarray(f) for f in feats], jnp.asarray(boxes), strides,
            output_size=7, sampling_ratio=2, min_level=2,
        )
    )
    ref0 = roi_align_reference(feats[0], boxes[0], 1 / 4, 7, 2)
    ref1 = roi_align_reference(feats[1], boxes[1], 1 / 8, 7, 2)
    np.testing.assert_allclose(got[0], ref0, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got[1], ref1, rtol=1e-4, atol=1e-5)


def test_tiled_matches_exact():
    """The tiled slice-gather RoIAlign reproduces the point-gather kernel
    bit-near-exactly for in-budget boxes."""
    import numpy as np
    import jax.numpy as jnp
    from lvc_tpu.ops.roi_align import (
        batched_multilevel_roi_align,
        batched_multilevel_roi_align_tiled,
    )

    rng = np.random.RandomState(0)
    B, C = 2, 16
    strides = (4, 8, 16, 32)
    H, W = 128, 160
    feats = [jnp.asarray(rng.rand(B, H // s, W // s, C).astype(np.float32)) for s in strides]
    R = 24
    boxes = np.zeros((B, R, 4), np.float32)
    for b in range(B):
        for r in range(R):
            x0, y0 = rng.rand(2) * 80
            w, h = rng.rand(2) * 60 + 4
            boxes[b, r] = [x0, y0, min(x0 + w, W - 1), min(y0 + h, H - 1)]
    jb = jnp.asarray(boxes)
    exact = batched_multilevel_roi_align(feats, jb, strides)
    tiled = batched_multilevel_roi_align_tiled(feats, jb, strides)
    np.testing.assert_allclose(np.asarray(exact), np.asarray(tiled), atol=1e-5)


def test_pallas_matches_exact_interpret():
    """The pallas DMA kernel (interpret mode on CPU) reproduces the exact
    kernel. On real TPU hardware the same kernel pools an R-101-FPN batch
    ~10x faster than the XLA point gather (see ops/roi_align.py)."""
    import numpy as np
    import jax.numpy as jnp
    from lvc_tpu.ops.roi_align import (
        batched_multilevel_roi_align,
        batched_multilevel_roi_align_pallas,
    )

    rng = np.random.RandomState(1)
    B, C = 1, 128
    strides = (4, 8, 16, 32)
    H, W = 64, 96
    feats = [jnp.asarray(rng.rand(B, H // s, W // s, C).astype(np.float32)) for s in strides]
    R = 9  # exercises group padding (group=8)
    boxes = np.zeros((B, R, 4), np.float32)
    for r in range(R):
        x0, y0 = rng.rand(2) * 40
        w, h = rng.rand(2) * 30 + 4
        boxes[0, r] = [x0, y0, min(x0 + w, W - 1), min(y0 + h, H - 1)]
    jb = jnp.asarray(boxes)
    exact = batched_multilevel_roi_align(feats, jb, strides)
    pal = batched_multilevel_roi_align_pallas(feats, jb, strides, tile=32, interpret=True)
    np.testing.assert_allclose(np.asarray(exact), np.asarray(pal), atol=1e-5)


def test_pallas_paired_matches_exact_interpret():
    """Paired-DMA kernel (serving default) vs the exact gather."""
    import jax.numpy as jnp
    from lvc_tpu.ops import roi_align as ra

    rng = np.random.RandomState(11)
    B, R, C = 1, 16, 256
    feats = []
    h, w = 32, 48
    for _ in range(5):
        feats.append(jnp.asarray(rng.rand(B, h, w, C).astype(np.float32)))
        h, w = (h + 1) // 2, (w + 1) // 2
    strides = (4, 8, 16, 32, 64)
    s = rng.uniform(8, 150, (B, R))
    ar = rng.uniform(0.5, 2.0, (B, R))
    bw = s * np.sqrt(ar)
    bh = s / np.sqrt(ar)
    x0 = rng.uniform(0, 1, (B, R)) * (192 - bw)
    y0 = rng.uniform(0, 1, (B, R)) * (128 - bh)
    boxes = jnp.asarray(np.stack([x0, y0, x0 + bw, y0 + bh], -1), np.float32)
    got = ra.batched_multilevel_roi_align_pallas_paired(
        feats, boxes, strides, interpret=True
    )
    want = ra.batched_multilevel_roi_align(feats, boxes, strides)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_pallas_fast_band_matches_exact_for_square_boxes():
    """Band kernel: reference-exact whenever no level bump triggers
    (square boxes never exceed the tile-4 budget)."""
    import jax.numpy as jnp
    from lvc_tpu.ops import roi_align as ra

    rng = np.random.RandomState(12)
    B, R, C = 1, 16, 256
    feats = []
    h, w = 32, 48
    for _ in range(5):
        feats.append(jnp.asarray(rng.rand(B, h, w, C).astype(np.float32)))
        h, w = (h + 1) // 2, (w + 1) // 2
    strides = (4, 8, 16, 32, 64)
    s = rng.uniform(8, 150, (B, R))
    x0 = rng.uniform(0, 1, (B, R)) * (192 - s)
    y0 = rng.uniform(0, 1, (B, R)) * (128 - s)
    boxes = jnp.asarray(np.stack([x0, y0, x0 + s, y0 + s], -1), np.float32)
    got = ra.batched_multilevel_roi_align_pallas_fast(
        feats, boxes, strides, interpret=True
    )
    want = ra.batched_multilevel_roi_align(feats, boxes, strides)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_pallas_trainable_vjp_matches_exact_gather_grad():
    """Custom-VJP pool: forward and feature grads must match autodiff of
    the exact gather (box grads are zero by design — detached proposals)."""
    import functools
    import jax
    import jax.numpy as jnp
    import lvc_tpu.ops.roi_align as m

    orig_paired = m.batched_multilevel_roi_align_pallas_paired
    orig_bwd = m._roi_align_paired_bwd_impl
    m.batched_multilevel_roi_align_pallas_paired = functools.partial(
        orig_paired, interpret=True
    )
    m._roi_align_paired_bwd_impl = functools.partial(orig_bwd, interpret=True)
    try:
        rng = np.random.RandomState(13)
        B, R, C = 1, 10, 256
        feats = []
        h, w = 32, 48
        for _ in range(5):
            feats.append(jnp.asarray(rng.rand(B, h, w, C).astype(np.float32)))
            h, w = (h + 1) // 2, (w + 1) // 2
        feats = tuple(feats)
        strides = (4, 8, 16, 32, 64)
        s = rng.uniform(8, 120, (B, R))
        ar = rng.uniform(0.5, 2.0, (B, R))
        bw = s * np.sqrt(ar)
        bh = s / np.sqrt(ar)
        x0 = rng.uniform(0, 1, (B, R)) * (192 - bw)
        y0 = rng.uniform(0, 1, (B, R)) * (128 - bh)
        boxes = jnp.asarray(np.stack([x0, y0, x0 + bw, y0 + bh], -1), np.float32)
        gvec = jnp.asarray(rng.rand(B, R, 7, 7, C).astype(np.float32))

        def loss_tr(fs):
            out = m.batched_multilevel_roi_align_pallas_trainable(fs, boxes, strides)
            return jnp.sum(out * gvec)

        def loss_ex(fs):
            out = m.batched_multilevel_roi_align(list(fs), boxes, strides)
            return jnp.sum(out * gvec)

        assert abs(float(loss_tr(feats)) - float(loss_ex(feats))) < 1e-2
        g_tr = jax.grad(loss_tr)(feats)
        g_ex = jax.grad(loss_ex)(feats)
        for a, b in zip(g_tr, g_ex):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    finally:
        m.batched_multilevel_roi_align_pallas_paired = orig_paired
        m._roi_align_paired_bwd_impl = orig_bwd


def test_pallas_trainable_vjp_unaligned_channels():
    """Backward must handle channel counts that are not lane-multiples:
    the forward returns unpadded channels, so the incoming cotangent has
    C0 channels while the kernel works at the padded width (ADVICE r1)."""
    import functools
    import jax
    import jax.numpy as jnp
    import lvc_tpu.ops.roi_align as m

    orig_paired = m.batched_multilevel_roi_align_pallas_paired
    orig_bwd = m._roi_align_paired_bwd_impl
    m.batched_multilevel_roi_align_pallas_paired = functools.partial(
        orig_paired, interpret=True
    )
    m._roi_align_paired_bwd_impl = functools.partial(orig_bwd, interpret=True)
    try:
        rng = np.random.RandomState(5)
        B, R, C = 1, 4, 96  # 96 is not a multiple of 128
        feats = []
        h, w = 16, 24
        for _ in range(2):
            feats.append(jnp.asarray(rng.rand(B, h, w, C).astype(np.float32)))
            h, w = (h + 1) // 2, (w + 1) // 2
        feats = tuple(feats)
        strides = (4, 8)
        x0 = rng.uniform(0, 30, (B, R))
        y0 = rng.uniform(0, 20, (B, R))
        bw = rng.uniform(6, 30, (B, R))
        bh = rng.uniform(6, 20, (B, R))
        boxes = jnp.asarray(np.stack([x0, y0, x0 + bw, y0 + bh], -1), np.float32)
        gvec = jnp.asarray(rng.rand(B, R, 7, 7, C).astype(np.float32))

        def loss_tr(fs):
            out = m.batched_multilevel_roi_align_pallas_trainable(fs, boxes, strides)
            return jnp.sum(out * gvec)

        def loss_ex(fs):
            out = m.batched_multilevel_roi_align(list(fs), boxes, strides)
            return jnp.sum(out * gvec)

        g_tr = jax.grad(loss_tr)(feats)
        g_ex = jax.grad(loss_ex)(feats)
        for a, b in zip(g_tr, g_ex):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    finally:
        m.batched_multilevel_roi_align_pallas_paired = orig_paired
        m._roi_align_paired_bwd_impl = orig_bwd


def test_pallas_paired_mask_resolution_shrinks_group():
    """P=14 (the mask pooler) exceeds the 16MB scoped-VMEM budget at
    group=8/depth=2 on a real chip (observed OOM: 21.66M request); the
    kernel must shrink the DMA group to fit and still match the exact
    gather at output_size=14."""
    import jax.numpy as jnp
    from lvc_tpu.ops import roi_align as ra

    rng = np.random.RandomState(13)
    B, R, C = 1, 12, 256
    feats = []
    h, w = 32, 48
    for _ in range(5):
        feats.append(jnp.asarray(rng.rand(B, h, w, C).astype(np.float32)))
        h, w = (h + 1) // 2, (w + 1) // 2
    strides = (4, 8, 16, 32, 64)
    s = rng.uniform(8, 150, (B, R))
    ar = rng.uniform(0.5, 2.0, (B, R))
    bw = s * np.sqrt(ar)
    bh = s / np.sqrt(ar)
    x0 = rng.uniform(0, 1, (B, R)) * (192 - bw)
    y0 = rng.uniform(0, 1, (B, R)) * (128 - bh)
    boxes = jnp.asarray(np.stack([x0, y0, x0 + bw, y0 + bh], -1), np.float32)
    got = ra.batched_multilevel_roi_align_pallas_paired(
        feats, boxes, strides, output_size=14, interpret=True
    )
    want = ra.batched_multilevel_roi_align(feats, boxes, strides, output_size=14)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_pallas_patch_ml_bit_identical_to_band():
    """Stage-free patch kernel (per-level refs, one DMA per box): output
    must be BIT-identical to the band kernel — same weights, same
    accumulation order; only the data movement differs. Includes canvas-
    sized, corner-hugging and degenerate boxes to exercise the window
    clamps and the per-level row addressing."""
    import jax.numpy as jnp
    from lvc_tpu.ops import roi_align as ra

    rng = np.random.RandomState(7)
    B, R, C = 2, 21, 256
    feats = []
    h, w = 32, 48
    for _ in range(4):
        feats.append(jnp.asarray(rng.rand(B, h, w, C).astype(np.float32)))
        h, w = (h + 1) // 2, (w + 1) // 2
    strides = (4, 8, 16, 32)
    s = rng.uniform(8, 150, (B, R))
    ar = rng.uniform(0.5, 2.0, (B, R))
    bw, bh = s * np.sqrt(ar), s / np.sqrt(ar)
    x0 = rng.uniform(0, 1, (B, R)) * (192 - bw)
    y0 = rng.uniform(0, 1, (B, R)) * (128 - bh)
    boxes = jnp.asarray(np.stack([x0, y0, x0 + bw, y0 + bh], -1), np.float32)
    boxes = boxes.at[0, 0].set(jnp.array([0.0, 0.0, 191.9, 127.9]))
    boxes = boxes.at[0, 1].set(jnp.array([188.0, 124.0, 192.0, 128.0]))
    boxes = boxes.at[0, 2].set(jnp.array([5.0, 5.0, 5.0, 5.0]))
    boxes = boxes.at[1, 0].set(jnp.array([0.0, 124.0, 4.0, 128.0]))
    boxes = boxes.at[1, 1].set(jnp.array([185.0, 0.0, 192.0, 6.0]))
    band = ra.batched_multilevel_roi_align_pallas_fast(
        feats, boxes, strides, interpret=True
    )
    ml = ra.batched_multilevel_roi_align_pallas_patch_ml(
        feats, boxes, strides, interpret=True
    )
    patch = ra.batched_multilevel_roi_align_pallas_patch(
        feats, boxes, strides, interpret=True
    )
    assert np.abs(np.asarray(band) - np.asarray(ml)).max() == 0.0
    assert np.abs(np.asarray(band) - np.asarray(patch)).max() == 0.0
    # measurement-only kernel variants (scripts/bench_pool_serving.py):
    # on chip the fused/groupdot restructures are measured BIT-identical
    # (0/200M elems differ, docs/PERF.md round-5 serving levers); CPU
    # interpret mode lowers the dots to XLA CPU GEMMs whose blocking can
    # round 1 ulp differently, so the CI pin is 1-ulp; bf16x3
    # (split-precision dots, ~2^-15 rel) gets a matching tolerance
    for mode in ("fused", "groupdot"):
        alt = ra.batched_multilevel_roi_align_pallas_patch_ml(
            feats, boxes, strides, interpret=True, _compute=mode
        )
        np.testing.assert_allclose(
            np.asarray(alt), np.asarray(band), rtol=3e-7, atol=3e-7,
            err_msg=mode,
        )
    b3 = ra.batched_multilevel_roi_align_pallas_patch_ml(
        feats, boxes, strides, interpret=True, dot_impl="bf16x3"
    )
    np.testing.assert_allclose(
        np.asarray(b3), np.asarray(band), rtol=2e-4, atol=2e-4
    )


def _interp_ml(m):
    """Context helper: force interpret mode on the round-5 train pool."""
    import functools

    orig_fwd = m.batched_multilevel_roi_align_pallas_paired_ml
    orig_bwd = m._roi_align_ml_bwd_impl
    m.batched_multilevel_roi_align_pallas_paired_ml = functools.partial(
        orig_fwd, interpret=True
    )
    m._roi_align_ml_bwd_impl = functools.partial(orig_bwd, interpret=True)
    return orig_fwd, orig_bwd


def test_pallas_train_ml_vjp_matches_exact_gather_grad():
    """Round-5 stage-free train pool (per-level no-copy forward + pipelined
    conflict-predicated RMW backward): forward and feature grads must match
    autodiff of the exact gather, including boxes hugging the bottom/right
    edge of the last image (clamped windows + shifted pair weights)."""
    import jax
    import jax.numpy as jnp
    import lvc_tpu.ops.roi_align as m

    orig_fwd, orig_bwd = _interp_ml(m)
    try:
        rng = np.random.RandomState(13)
        B, R, C = 2, 12, 256
        feats = []
        h, w = 64, 96
        for _ in range(5):
            feats.append(jnp.asarray(rng.rand(B, h, w, C).astype(np.float32)))
            h, w = (h + 1) // 2, (w + 1) // 2
        feats = tuple(feats)
        strides = (4, 8, 16, 32, 64)
        s = rng.uniform(8, 250, (B, R))
        ar = rng.uniform(0.5, 2.0, (B, R))
        bw = s * np.sqrt(ar)
        bh = s / np.sqrt(ar)
        x0 = rng.uniform(0, 1, (B, R)) * (384 - bw)
        y0 = rng.uniform(0, 1, (B, R)) * (256 - bh)
        # corner-hugging boxes exercise the window clamps + shift bits
        x0[-1, :3] = 384 - bw[-1, :3]
        y0[-1, :3] = 256 - bh[-1, :3]
        boxes = jnp.asarray(np.stack([x0, y0, x0 + bw, y0 + bh], -1), np.float32)
        gvec = jnp.asarray(rng.rand(B, R, 7, 7, C).astype(np.float32))

        def loss_tr(fs):
            out = m.batched_multilevel_roi_align_pallas_train_ml(fs, boxes, strides)
            return jnp.sum(out * gvec)

        def loss_ex(fs):
            out = m.batched_multilevel_roi_align(list(fs), boxes, strides)
            return jnp.sum(out * gvec)

        lt, le = float(loss_tr(feats)), float(loss_ex(feats))
        assert abs(lt - le) / max(abs(le), 1.0) < 1e-5
        g_tr = jax.grad(loss_tr)(feats)
        g_ex = jax.grad(loss_ex)(feats)
        for a, b in zip(g_tr, g_ex):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    finally:
        m.batched_multilevel_roi_align_pallas_paired_ml = orig_fwd
        m._roi_align_ml_bwd_impl = orig_bwd


def test_pallas_train_ml_vjp_unaligned_channels_and_tiny_levels():
    """Unaligned channel counts (pad-to-lane handling in both directions)
    and levels too small to host a window (padded-level fallback)."""
    import jax
    import jax.numpy as jnp
    import lvc_tpu.ops.roi_align as m

    orig_fwd, orig_bwd = _interp_ml(m)
    try:
        rng = np.random.RandomState(5)
        B, R, C = 1, 6, 96  # 96 not a lane multiple; B*H < window for all levels
        feats = []
        h, w = 16, 24
        for _ in range(2):
            feats.append(jnp.asarray(rng.rand(B, h, w, C).astype(np.float32)))
            h, w = (h + 1) // 2, (w + 1) // 2
        feats = tuple(feats)
        strides = (4, 8)
        x0 = rng.uniform(0, 30, (B, R))
        y0 = rng.uniform(0, 20, (B, R))
        bw = rng.uniform(6, 30, (B, R))
        bh = rng.uniform(6, 20, (B, R))
        boxes = jnp.asarray(np.stack([x0, y0, x0 + bw, y0 + bh], -1), np.float32)
        gvec = jnp.asarray(rng.rand(B, R, 7, 7, C).astype(np.float32))

        def loss_tr(fs):
            out = m.batched_multilevel_roi_align_pallas_train_ml(fs, boxes, strides)
            return jnp.sum(out * gvec)

        def loss_ex(fs):
            out = m.batched_multilevel_roi_align(list(fs), boxes, strides)
            return jnp.sum(out * gvec)

        g_tr = jax.grad(loss_tr)(feats)
        g_ex = jax.grad(loss_ex)(feats)
        for a, b in zip(g_tr, g_ex):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    finally:
        m.batched_multilevel_roi_align_pallas_paired_ml = orig_fwd
        m._roi_align_ml_bwd_impl = orig_bwd


def test_pooler_grid2_vs_grid4_training_grad_deviation_quantified():
    """ADVICE r4: the POOLER_MAX_GRID=2 default caps the adaptive sampling
    grid the reference computes as ceil(bin) — quantify what that does to
    TRAINING gradients through the pooler (not just serving scores). The
    bound asserted here is recorded in PARITY.md ("Pooler grid and
    training gradients")."""
    import jax
    import jax.numpy as jnp
    import lvc_tpu.ops.roi_align as m

    rng = np.random.RandomState(3)
    B, R, C = 2, 16, 64
    feats = []
    h, w = 64, 96
    for _ in range(5):
        feats.append(jnp.asarray(rng.rand(B, h, w, C).astype(np.float32)))
        h, w = (h + 1) // 2, (w + 1) // 2
    feats = tuple(feats)
    strides = (4, 8, 16, 32, 64)
    s = rng.uniform(16, 300, (B, R))
    x0 = rng.uniform(0, 1, (B, R)) * (384 - s)
    y0 = rng.uniform(0, 1, (B, R)) * (256 - s)
    boxes = jnp.asarray(np.stack([x0, y0, x0 + s, y0 + s], -1), np.float32)
    gvec = jnp.asarray(rng.rand(B, R, 7, 7, C).astype(np.float32))

    def grads(max_grid):
        def loss(fs):
            out = m.batched_multilevel_roi_align(
                list(fs), boxes, strides, max_grid=max_grid
            )
            return jnp.sum(out * gvec)

        return jax.grad(loss)(feats)

    g2, g4 = grads(2), grads(4)
    flat2 = np.concatenate([np.asarray(a).ravel() for a in g2])
    flat4 = np.concatenate([np.asarray(a).ravel() for a in g4])
    cos = float(
        (flat2 * flat4).sum()
        / (np.linalg.norm(flat2) * np.linalg.norm(flat4) + 1e-12)
    )
    rel = float(
        np.linalg.norm(flat2 - flat4) / (np.linalg.norm(flat4) + 1e-12)
    )
    # grid-2's samples are a (weight-renormalized) subset of grid-4's:
    # gradients stay closely aligned. Measured on this workload:
    # cos 0.980, rel l2 0.20 (recorded in PARITY.md)
    print(f"pooler grid2-vs-4 grad: cos {cos:.4f} rel {rel:.4f}")
    assert cos > 0.97, cos
    assert rel < 0.3, rel
