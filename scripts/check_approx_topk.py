"""On-TPU deviation + timing check for MODEL.RPN.APPROX_TOPK serving mode.

The RPN's per-level pre-NMS selection uses jax.lax.top_k, which lowers to
a full sort on TPU (~3 ms/batch of the serving step at bs16 R-101).
`MODEL.RPN.APPROX_TOPK` switches it to jax.lax.approx_max_k (TPU-native
partial reduction, default recall target 0.95 per XLA docs). This script
quantifies what that approximation does to the FINAL detections — the
analogue of the POOLER_MAX_GRID quantification in PARITY.md: same
converted-damped weights, same images, approx on vs off, matched-detection
box/score deltas + match rate.

Usage: python scripts/check_approx_topk.py [--batch 8] [--iters 5]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--height", type=int, default=832)
    ap.add_argument("--width", type=int, default=1344)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--depth", type=int, default=101)
    args = ap.parse_args()

    import jax

    cache_dir = os.path.expanduser("~/.cache/lvc_tpu/jax_bench_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    import __graft_entry__ as g
    from lvc_tpu.modeling.meta_arch.build import build_model

    results = {}
    for approx in (False, True):
        cfg = g._small_cfg()
        cfg.MODEL.RESNETS.DEPTH = args.depth
        cfg.MODEL.DTYPE = "bfloat16"
        cfg.MODEL.ROI_HEADS.POOLER_IMPL = "pallas_fast"
        cfg.MODEL.RPN.APPROX_TOPK = approx
        # random-init softmax scores (~1/81) never clear the default 0.05
        # threshold, which would make the deviation check vacuous (0
        # detections on both sides); keep topk-by-score with no floor
        cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.0
        model = build_model(cfg)
        batch = g._make_batch(B=args.batch, H=args.height, W=args.width)
        variables = g.fast_init(
            model, {"params": jax.random.PRNGKey(0)}, batch, train=False
        )
        compiled = (
            jax.jit(lambda b: model.apply(variables, b, train=False))
            .lower(batch)
            .compile()
        )
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
            f"approx={approx}: {dt * 1000:7.1f} ms/batch  "
            f"{args.batch / dt:6.1f} img/s/chip",
            flush=True,
        )
        results[approx] = (
            np.asarray(out.boxes, np.float32),
            np.asarray(out.scores, np.float32),
            np.asarray(out.classes) if hasattr(out, "classes") else None,
            np.asarray(out.valid),
            dt,
        )

    be, se, ce, ve, dte = results[False]
    ba, sa, ca, va, dta = results[True]
    print("valid count exact/approx:", ve.sum(), va.sum())
    # per-image greedy match: for each exact detection, is there an approx
    # detection of the same class within 1px and 1e-3 score?
    matched = total = 0
    box_d = []
    score_d = []
    B = be.shape[0]
    for b in range(B):
        for i in np.where(ve[b])[0]:
            total += 1
            same = va[b]
            if ce is not None:
                same = same & (ca[b] == ce[b][i])
            close = (
                same
                & (np.abs(ba[b] - be[b][i]).max(-1) < 1.0)
                & (np.abs(sa[b] - se[b][i]) < 1e-3)
            )
            if close.any():
                matched += 1
                j = np.argmax(close)
                box_d.append(np.abs(ba[b][j] - be[b][i]).max())
                score_d.append(abs(sa[b][j] - se[b][i]))
    print(
        f"matched {matched}/{total} exact detections "
        f"({100.0 * matched / max(total, 1):.2f}%)"
    )
    if box_d:
        print(
            f"on matches: box |delta| mean {np.mean(box_d):.2e} max {np.max(box_d):.2e}; "
            f"score |delta| mean {np.mean(score_d):.2e} max {np.max(score_d):.2e}"
        )
    print(f"speedup: {dte / dta:.3f}x")


if __name__ == "__main__":
    main()
