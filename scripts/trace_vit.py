"""Op-level device-time budget of the DINO ViT-S/8 verifier forward.

Same measurement loop as scripts/trace_serving.py but for the
verification-stage hot op (lvc_tpu/modeling/backbone/vit.py; reference
hot loop tools/run_nearest_neighbours.py:108-128): batch-64 224x224 crops
through the ViT in the serving dtype, perfetto device trace aggregated by
op name, plus throughput and an analytic MFU figure.

Usage: python scripts/trace_vit.py [--batch 64] [--iters 10] [--dtype bfloat16]
"""
import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def vit_flops(batch, n_tokens=785, dim=384, depth=12, heads=6):
    """Analytic FLOPs of the ViT forward (matmuls only, 2 FLOP/MAC)."""
    per_block = (
        2 * n_tokens * dim * 3 * dim      # qkv
        + 2 * n_tokens * n_tokens * dim   # q @ k^T (all heads)
        + 2 * n_tokens * n_tokens * dim   # attn @ v
        + 2 * n_tokens * dim * dim        # proj
        + 2 * n_tokens * dim * 4 * dim * 2  # mlp fc1 + fc2
    )
    patch_embed = 2 * n_tokens * dim * (8 * 8 * 3)
    return batch * (depth * per_block + patch_embed)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--no-trace", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "lvc_tpu", "jax_bench_cache",
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from lvc_tpu.modeling.backbone.vit import dino_vits8
    from lvc_tpu.modeling.layers import compute_dtype_scope

    model = dino_vits8()
    x = jnp.asarray(np.random.RandomState(0).rand(args.batch, 224, 224, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    def fwd(v, x):
        with compute_dtype_scope(args.dtype):
            return model.apply(v, x)

    compiled = jax.jit(fwd).lower(variables, x).compile()
    out = compiled(variables, x)
    jax.block_until_ready(out)
    for _ in range(3):
        jax.block_until_ready(compiled(variables, x))

    # throughput (device-side readback per iter batch to defeat the tunnel's
    # unreliable block_until_ready — docs/PERF.md "Measurement note")
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = compiled(variables, x)
    jax.block_until_ready(out)
    float(out.sum())
    dt = time.perf_counter() - t0
    crops_s = args.batch * args.iters / dt
    flops = vit_flops(args.batch)
    print(
        f"throughput: {crops_s:.0f} crops/s  "
        f"({flops * args.iters / dt / 1e12:.1f} TFLOP/s, "
        f"{100 * flops * args.iters / dt / 1e12 / 197:.1f}% MFU bf16, "
        f"{dt / args.iters * 1000:.2f} ms/batch{args.batch})"
    )
    if args.no_trace:
        return

    outdir = tempfile.mkdtemp(prefix="lvc_vit_trace_")
    with jax.profiler.trace(outdir, create_perfetto_trace=True):
        for _ in range(args.iters):
            out = compiled(variables, x)
        jax.block_until_ready(out)

    paths = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print("no perfetto trace found under", outdir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    tid_names = {}
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e.get("pid"), e.get("tid"))] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e.get("pid")] = e["args"].get("name", "")

    def is_device_op_track(pid, tid):
        tn = tid_names.get((pid, tid), "")
        pn = pid_names.get(pid, "")
        return ("XLA Ops" in tn) or ("TensorFlow Op" in tn and "TPU" in pn)

    agg = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or not is_device_op_track(e.get("pid"), e.get("tid")):
            continue
        dur = e.get("dur", 0) / 1e3
        agg[e.get("name", "?")] += dur
        total += dur
    per_batch = total / args.iters
    print(f"\ndevice op time: {per_batch:.3f} ms/batch ({args.batch / per_batch * 1000:.0f} crops/s)")
    print(f"top {args.top} ops:")
    for name, dur in agg.most_common(args.top):
        print(f"  {dur / args.iters:8.3f} ms  {100 * dur / total:5.1f}%  {name[:110]}")
    print("\ntrace:", path)


if __name__ == "__main__":
    main()
