"""On-TPU equivalence + timing check for the fused residual-epilogue GEMM.

Builds the bench.py serving config (R-101-FPN, bf16, pallas_fast pooler),
runs the same batch with the fused path on and off (LVC_TPU_FUSED_RESIDUAL
is read at trace time), and reports max box/score deltas plus per-batch
latency for both. Detections must match to bf16 noise: the fused GEMM
accumulates in f32, the unfused path rounds through bf16 twice.

Usage: python scripts/check_fused_serving.py [--batch 16] [--iters 10]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--height", type=int, default=832)
    ap.add_argument("--width", type=int, default=1344)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax

    import __graft_entry__ as g
    from lvc_tpu.modeling.meta_arch.build import build_model

    cfg = g._small_cfg()
    cfg.MODEL.RESNETS.DEPTH = 101
    cfg.MODEL.DTYPE = "bfloat16"
    cfg.MODEL.ROI_HEADS.POOLER_IMPL = "pallas_fast"
    # random-init softmax scores (~1/81) never clear the default 0.05
    # threshold, which made the equivalence check vacuous; keep topk-by-score
    # with no floor so both paths emit comparable detections
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.0
    model = build_model(cfg)
    batch = g._make_batch(B=args.batch, H=args.height, W=args.width)
    variables = g.fast_init(
        model, {"params": jax.random.PRNGKey(0)}, batch, train=False
    )

    def run(fused: bool):
        os.environ["LVC_TPU_FUSED_RESIDUAL"] = "1" if fused else "0"

        def _infer(b):
            return model.apply(variables, b, train=False)

        compiled = jax.jit(_infer).lower(batch).compile()
        out = compiled(batch)
        jax.block_until_ready(out)
        for _ in range(2):
            jax.block_until_ready(compiled(batch))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = compiled(batch)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(
            f"fused={fused}: {dt * 1000:7.1f} ms/batch  "
            f"{args.batch / dt:6.1f} img/s/chip",
            flush=True,
        )
        return out, dt

    out_f, dt_f = run(True)
    out_u, dt_u = run(False)
    bf, bu = np.asarray(out_f.boxes, np.float32), np.asarray(out_u.boxes, np.float32)
    sf, su = np.asarray(out_f.scores, np.float32), np.asarray(out_u.scores, np.float32)
    vf, vu = np.asarray(out_f.valid), np.asarray(out_u.valid)
    print("valid count fused/unfused:", vf.sum(), vu.sum())
    both = vf & vu
    print("max |box delta| on co-valid:", np.abs((bf - bu)[both]).max() if both.any() else 0.0)
    print("max |score delta| on co-valid:", np.abs((sf - su)[both]).max() if both.any() else 0.0)
    print(f"speedup: {dt_u / dt_f:.3f}x")


if __name__ == "__main__":
    main()
