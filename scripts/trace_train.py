"""Op-level device-time budget of the training step (perfetto trace).

The serving path has a per-op budget (scripts/trace_serving.py /
analyze_hlo.py); this gives the TRAIN step the same treatment — the train
path had not been re-traced since the custom-VJP Pallas pool landed
(VERDICT r3 weak #5). Aggregates device ops over N steps of the jitted
data-parallel train step at the reference base-training shape.

Usage: python scripts/trace_train.py [--batch 8] [--iters 5] [--mode f32|amp]
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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--height", type=int, default=832)
    ap.add_argument("--width", type=int, default=1344)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--mode", choices=["f32", "amp"], default="f32")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    import jax
    from jax.sharding import Mesh

    cache_dir = os.path.expanduser("~/.cache/lvc_tpu/jax_bench_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    import __graft_entry__ as g
    from lvc_tpu.modeling.meta_arch.build import build_model
    from lvc_tpu.solver.build import build_optimizer
    from lvc_tpu.engine.train_loop import (
        TrainState,
        make_data_parallel_train_step,
        shard_batch,
    )

    cfg = g._small_cfg()
    cfg.SOLVER.AMP.ENABLED = args.mode == "amp"
    model = build_model(cfg)
    batch = g._make_batch(B=args.batch, H=args.height, W=args.width, train=True)
    variables = g.fast_init(
        model,
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        batch,
        train=True,
    )
    tx = build_optimizer(cfg, variables["params"])
    state = TrainState.create(variables, tx)
    mesh = Mesh(np.array(jax.devices()), axis_names=("data",))
    train_step = make_data_parallel_train_step(
        model, tx, mesh, mixed_precision=cfg.SOLVER.AMP.ENABLED
    )
    with mesh:
        sharded = shard_batch(batch, mesh)
        for i in range(3):
            state, metrics = train_step(state, sharded, jax.random.PRNGKey(i))
            float(metrics["total_loss"])
        outdir = tempfile.mkdtemp(prefix="lvc_train_trace_")
        with jax.profiler.trace(outdir, create_perfetto_trace=True):
            for i in range(args.iters):
                state, metrics = train_step(state, sharded, jax.random.PRNGKey(50 + i))
            float(metrics["total_loss"])

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
    per_step = total / args.iters
    print(
        f"device op time: {per_step:.2f} ms/step ({args.batch / per_step * 1000:.1f} img/s) "
        f"mode={args.mode}"
    )
    print(f"top {args.top} ops:")
    for name, dur in agg.most_common(args.top):
        print(f"  {dur / args.iters:8.3f} ms  {100 * dur / total:5.1f}%  {name[:110]}")

    bins = collections.Counter()
    for name, dur in agg.items():
        n = name.lower()
        if "conv" in n:
            b = "conv-fusion"
        elif "custom-call" in n or "pool" in n:
            b = "custom-call/pool"
        elif "copy" in n or "transpose" in n or "bitcast" in n or "convert" in n or "reshape" in n or "pad" in n or "broadcast" in n:
            b = "layout"
        elif "sort" in n or "top-k" in n or "topk" in n:
            b = "sort/topk"
        elif "scatter" in n or "gather" in n or "dynamic" in n:
            b = "gather/scatter"
        elif "while" in n:
            b = "while-loop"
        elif "all-reduce" in n or "reduce-scatter" in n or "all-gather" in n:
            b = "collective"
        else:
            b = "other"
        bins[b] += dur
    print("\nby class (ms/step):")
    for b, dur in bins.most_common():
        print(f"  {dur / args.iters:8.3f} ms  {100 * dur / total:5.1f}%  {b}")
    print("\ntrace:", path)


if __name__ == "__main__":
    main()
