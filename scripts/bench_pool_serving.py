"""Standalone A/B bench of the serving RoIAlign patch kernel on chip.

Times `batched_multilevel_roi_align_pallas_patch_ml` at the serving shape
(bs16 x 1000 boxes, R-101-FPN p2-p5 at 832x1344, C=256 bf16) in three
compute modes to attribute the kernel's gap to its ~10.3 ms patch-DMA SOL
(docs/PERF.md "Closing round-4 budget"):

- full    : the shipping kernel (fp32-exact dots).
- stub    : same DMA traffic, near-zero compute -> the kernel's DMA floor.
- nodma   : DMA only on the first step -> pure compute rate.
- nodot   : DMA + VPU band combine, no MXU dots.
- hoist   : whole-patch f32 convert hoisted out of the band combine.
- fused   : ONE dot per box via lane-blocked staging (bit-identical).
- groupdot: ONE block-diagonal dot per 8-box group (bit-identical).
- dotdef  : Mosaic DEFAULT dot precision (inaccurate — measurement only).
- bf16x3  : dot_impl="bf16x3" split-precision dots (~2^-15 rel error).

Round-5 verdict of this ladder (docs/PERF.md "Round-5 serving levers"):
the DMA pipeline is clean (stub 0.89x SOL), the band combine hides under
the DMA (nodot ~= stub), and the fp32 dots are the whole gap — bound by
fixed per-dot operand staging in Mosaic's small-matmul codegen, not by
pass count (fused/groupdot/bf16x3 all measured neutral-ish). Run SOLO
(docs/PERF.md measurement note). Timing chains K calls with a data
dependency inside one jit, then fences with a scalar readback.

Usage: python scripts/bench_pool_serving.py [--batch 16] [--boxes 1000]
"""
import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_inputs(B, R, H, W, C, seed=0):
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    strides = (4, 8, 16, 32)
    # features generated ON DEVICE: pushing ~1.5 GB of host arrays through
    # the axon tunnel takes minutes
    key = jax.random.PRNGKey(seed)
    feats = []
    for s in strides:
        h, w = H // s, W // s
        key, sub = jax.random.split(key)
        feats.append(
            jax.jit(
                lambda k, sh=(B, h, w, C): jax.random.normal(k, sh, jnp.bfloat16)
            )(sub)
        )
    # serving-like boxes: post-NMS objects, log-uniform sides 32..600 px
    ws = np.exp(rng.uniform(np.log(32), np.log(600), (B, R)))
    hs = np.exp(rng.uniform(np.log(32), np.log(600), (B, R)))
    x0 = rng.uniform(0, W - ws)
    y0 = rng.uniform(0, H - hs)
    boxes = np.stack([x0, y0, x0 + ws, y0 + hs], -1).astype(np.float32)
    return feats, jnp.asarray(boxes), strides


def bench_mode(mode, feats, boxes, strides, iters, chain=4):
    import jax
    import jax.numpy as jnp
    from lvc_tpu.ops.roi_align import batched_multilevel_roi_align_pallas_patch_ml

    extra = (
        {"dot_impl": "bf16x3"} if mode == "bf16x3" else {"_compute": mode}
    )
    pool = functools.partial(
        batched_multilevel_roi_align_pallas_patch_ml,
        strides=strides, output_size=7, sampling_ratio=0, max_grid=2,
        min_level=2, **extra,
    )

    @jax.jit
    def step(feats, boxes):
        carry = jnp.float32(0.0)
        for _ in range(chain):
            out = pool(feats, boxes + carry * 1e-12)
            carry = out.astype(jnp.float32).sum()
        return carry

    # warmup + fence
    float(step(feats, boxes))
    float(step(feats, boxes))
    t0 = time.perf_counter()
    acc = None
    for _ in range(iters):
        acc = step(feats, boxes)
    float(acc)
    dt = (time.perf_counter() - t0) / (iters * chain)
    return dt * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--boxes", type=int, default=1000)
    ap.add_argument("--height", type=int, default=832)
    ap.add_argument("--width", type=int, default=1344)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--modes", default="full,stub,hoist")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        cache_dir = os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "lvc_tpu", "jax_bench_cache",
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass

    print(f"devices: {jax.devices()}", flush=True)
    feats, boxes, strides = make_inputs(
        args.batch, args.boxes, args.height, args.width, 256
    )
    n = args.batch * args.boxes
    # patch-DMA SOL: one (32, 32, 256) bf16 patch per box at ~819 GB/s HBM
    bytes_per_box = 32 * 32 * 256 * 2
    sol_ms = n * bytes_per_box / 819e9 * 1e3
    print(f"{n} boxes, {n * bytes_per_box / 1e9:.2f} GB patch reads, "
          f"DMA SOL ~{sol_ms:.1f} ms")

    results = {}
    for mode in args.modes.split(","):
        t0 = time.perf_counter()
        ms = bench_mode(mode, feats, boxes, strides, args.iters)
        results[mode] = ms
        print(f"{mode:>6}: {ms:7.2f} ms/call  ({ms / sol_ms:4.2f}x DMA SOL)  "
              f"[{time.perf_counter() - t0:.0f} s incl. compile]", flush=True)

    exactish = [m for m in results
                if m in ("hoist", "high", "dotdef", "fused", "groupdot", "bf16x3")]
    if "full" in results and exactish:
        from lvc_tpu.ops.roi_align import (
            batched_multilevel_roi_align_pallas_patch_ml as p,
        )
        a = np.asarray(
            p(feats, boxes, strides, 7, 0, 2, 2, _compute="full"), np.float32
        )
        for m in exactish:
            kw = {"dot_impl": "bf16x3"} if m == "bf16x3" else {"_compute": m}
            b = np.asarray(
                p(feats, boxes, strides, 7, 0, 2, 2, **kw), np.float32
            )
            neq = int((a != b).sum())
            rel = np.abs(a - b) / np.maximum(np.abs(a), 1e-6)
            print(f"{m} vs full: {neq}/{a.size} elems differ "
                  f"({100.0 * neq / a.size:.4f}%), max rel {rel.max():.2e}")


if __name__ == "__main__":
    main()
