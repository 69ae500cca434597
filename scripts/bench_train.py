"""Training-step throughput benchmark (R-50-FPN, reference canvas).

Measures the data-parallel train step at the reference's base-training
shape — bs8 per chip, 832x1344 canvas (configs/Base-RCNN-FPN.yaml) — in
f32 and mixed precision (SOLVER.AMP: f32 masters + bf16 compute), printing
ms/step and img/s/chip for docs/PERF.md. Timing forces a device-side
scalar readback per step (block_until_ready is unreliable through the
axon tunnel — docs/PERF.md "Measurement note").

Usage: python scripts/bench_train.py [--batch 8] [--iters 10] [--mode both]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(mode: str, batch_size: int, height: int, width: int, iters: int, warmup: int):
    import jax
    from jax.sharding import Mesh

    # persistent compile cache (same as bench.py): the train-step graph
    # takes minutes to compile through the TPU tunnel
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

    import __graft_entry__ as g
    from lvc_tpu.modeling.meta_arch.build import build_model
    from lvc_tpu.solver.build import build_optimizer
    from lvc_tpu.engine.train_loop import (
        TrainState,
        make_data_parallel_train_step,
        shard_batch,
    )

    cfg = g._small_cfg()
    cfg.SOLVER.AMP.ENABLED = mode == "amp"
    model = build_model(cfg)

    batch = g._make_batch(B=batch_size, H=height, W=width, train=True)
    variables = g.fast_init(
        model,
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        batch,
        train=True,
    )
    tx = build_optimizer(cfg, variables["params"])
    state = TrainState.create(variables, tx)

    n_dev = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()), axis_names=("data",))
    train_step = make_data_parallel_train_step(
        model, tx, mesh, mixed_precision=cfg.SOLVER.AMP.ENABLED
    )
    with mesh:
        sharded = shard_batch(batch, mesh)
        for i in range(warmup):
            state, metrics = train_step(state, sharded, jax.random.PRNGKey(i))
            float(metrics["total_loss"])  # scalar readback = device sync
        t0 = time.time()
        for i in range(iters):
            state, metrics = train_step(state, sharded, jax.random.PRNGKey(100 + i))
            float(metrics["total_loss"])
        dt = (time.time() - t0) / iters
    ms = dt * 1000.0
    print(
        f"{mode:>4}: {ms:8.1f} ms/step  "
        f"{batch_size / dt / n_dev:6.1f} img/s/chip  "
        f"(bs{batch_size}, {height}x{width}, {n_dev} device(s), "
        f"loss={float(metrics['total_loss']):.3f})",
        flush=True,
    )
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--height", type=int, default=832)
    ap.add_argument("--width", type=int, default=1344)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--mode", choices=["f32", "amp", "both"], default="both")
    args = ap.parse_args()
    modes = ["f32", "amp"] if args.mode == "both" else [args.mode]
    for mode in modes:
        bench(mode, args.batch, args.height, args.width, args.iters, args.warmup)


if __name__ == "__main__":
    main()
