"""Op-level device-time breakdown of the serving graph (perfetto trace).

Runs the bench model under ``jax.profiler.trace(create_perfetto_trace=True)``
and aggregates the device-track events by fused-op name, printing the top-N
fusions with their share of a batch step. This is the measurement the
roofline model (scripts/roofline.py) is compared against per op class
(conv vs elementwise vs copy/transpose vs pool/NMS).

Usage: python scripts/trace_serving.py [--batch 16] [--iters 5] [--top 40]
"""
import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--depth", type=int, default=101)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--outdir", default=None)
    args = ap.parse_args()

    import jax

    cache_dir = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "lvc_tpu", "jax_bench_cache",
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    import __graft_entry__ as g
    from lvc_tpu.modeling.meta_arch.build import build_model

    cfg = g._small_cfg()
    cfg.MODEL.RESNETS.DEPTH = args.depth
    cfg.MODEL.DTYPE = "bfloat16"
    cfg.MODEL.ROI_HEADS.POOLER_IMPL = "pallas_fast"
    cfg.MODEL.RPN.APPROX_TOPK = True  # keep in sync with bench.py
    model = build_model(cfg)
    batch = g._make_batch(B=args.batch, H=832, W=1344)
    variables = g.fast_init(model, {"params": jax.random.PRNGKey(0)}, batch, train=False)

    # closure constants are host-numpy (fast_init) — embeds instantly,
    # folds weight layouts at compile time (docs/PERF.md round 4)
    compiled = jax.jit(
        lambda b: model.apply(variables, b, train=False)
    ).lower(batch).compile()
    out = compiled(batch)
    jax.block_until_ready(out)
    for _ in range(2):
        jax.block_until_ready(compiled(batch))

    outdir = args.outdir or tempfile.mkdtemp(prefix="lvc_trace_")
    with jax.profiler.trace(outdir, create_perfetto_trace=True):
        for _ in range(args.iters):
            out = compiled(batch)
        jax.block_until_ready(out)

    # find the perfetto trace json.gz
    paths = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print("no perfetto trace found under", outdir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    # device tracks: pid/tid metadata names contain "TPU" / "XLA Ops"
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
        if e.get("ph") != "X":
            continue
        if not is_device_op_track(e.get("pid"), e.get("tid")):
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        agg[name] += dur
        total += dur
    if not agg:
        # fall back: list available tracks to debug
        print("no device op events; tracks seen:")
        for k, v in sorted(set(tid_names.items())):
            print("  ", k, v)
        return

    per_batch = total / args.iters
    print(f"device op time: {per_batch:.2f} ms/batch over {args.iters} iters "
          f"({args.batch / per_batch * 1000:.1f} img/s)")
    print(f"\ntop {args.top} ops (summed over {args.iters} iters):")
    for name, dur in agg.most_common(args.top):
        print(f"  {dur / args.iters:8.3f} ms  {100 * dur / total:5.1f}%  {name[:110]}")

    # classify into coarse bins by name heuristics
    bins = collections.Counter()
    for name, dur in agg.items():
        n = name.lower()
        if "conv" in n:
            b = "conv-fusion"
        elif "dot" in n or "matmul" in n:
            b = "dot-fusion"
        elif "custom-call" in n or "tpu_custom_call" in n or "pallas" in n:
            b = "custom-call (pallas)"
        elif "copy" in n or "transpose" in n or "bitcast" in n or "convert" in n:
            b = "copy/transpose/convert"
        elif "sort" in n or "top-k" in n or "topk" in n:
            b = "sort/topk"
        elif "reduce-window" in n or "select-and-scatter" in n or "pool" in n:
            b = "pool"
        elif "scatter" in n or "gather" in n or "dynamic" in n:
            b = "gather/scatter/dynamic"
        else:
            b = "other"
        bins[b] += dur
    print("\nby class (ms/batch):")
    for b, dur in bins.most_common():
        print(f"  {dur / args.iters:8.3f} ms  {100 * dur / total:5.1f}%  {b}")
    print("\ntrace:", path)


if __name__ == "__main__":
    main()
