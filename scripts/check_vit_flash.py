"""On-TPU equivalence + timing for the ViT flash-attention path.

Compares the DINO ViT-S/8 einsum attention (reference semantics: f32
softmax over the materialized (B, H, N, N) tensor) against the Pallas
flash kernel path (_flash_mha: online f32 softmax, N padded 785->896 with
SegmentIds masking) on the same weights and crops: descriptor cosine,
max |delta|, and crops/s for both. This is the quantification gate for
making "auto" (flash-on-TPU) the verifier default.

Usage: python scripts/check_vit_flash.py [--batch 64] [--iters 10]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.expanduser("~/.cache/lvc_tpu/jax_bench_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from lvc_tpu.modeling.backbone.vit import dino_vits8
    from lvc_tpu.modeling.layers import compute_dtype_scope

    x = jnp.asarray(
        np.random.RandomState(0).rand(args.batch, 224, 224, 3), jnp.float32
    )
    results = {}
    # model structure is identical for both impls: init once, reuse
    variables = dino_vits8(attn_impl="einsum").init(jax.random.PRNGKey(0), x)
    for impl in ("einsum", "flash"):
        model = dino_vits8(attn_impl=impl)

        def fwd(v, x):
            with compute_dtype_scope(args.dtype):
                return model.apply(v, x)

        compiled = jax.jit(fwd).lower(variables, x).compile()
        out = compiled(variables, x)
        jax.block_until_ready(out)
        for _ in range(3):
            jax.block_until_ready(compiled(variables, x))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = compiled(variables, x)
        jax.block_until_ready(out)
        float(jnp.asarray(out, jnp.float32).sum())
        dt = time.perf_counter() - t0
        desc = np.asarray(out, np.float32)
        results[impl] = (desc, args.batch * args.iters / dt)
        print(f"{impl:>7}: {results[impl][1]:8.0f} crops/s "
              f"({dt / args.iters * 1000:.2f} ms/batch{args.batch})", flush=True)

    de, te = results["einsum"]
    df, tf = results["flash"]
    cos = np.sum(de * df, -1) / (
        np.linalg.norm(de, axis=-1) * np.linalg.norm(df, axis=-1) + 1e-12
    )
    print(f"descriptor cosine: min {cos.min():.8f} mean {cos.mean():.8f}")
    print(f"max |delta|: {np.abs(de - df).max():.3e} "
          f"(scale {np.abs(de).mean():.3e})")
    print(f"speedup: {tf / te:.3f}x")


if __name__ == "__main__":
    main()
