"""Analytic roofline (speed-of-light) model for the serving graph.

Enumerates every conv/FC in R-101-FPN + RPN head + box head at the bench
shape (bs16, 832x1344, bf16) and charges each op
``max(flops / PEAK_FLOPS, hbm_bytes / PEAK_BW)`` — the per-op roofline.
HBM bytes per op = input activation + output activation + weights (ideal:
each tensor touched once; XLA fusion of elementwise/BN/ReLU into the conv
epilogue is assumed free, which is what XLA does on TPU).

This is the SOL the measured stage budget is compared against in
docs/PERF.md (VERDICT r2 next #5): it deliberately models *XLA conv
efficiency on these shapes* as the per-op roofline rather than peak-MXU
everywhere, because HBM-bound 1x1 convs at large spatial extents cannot
reach MXU peak regardless of scheduling.

Usage: python scripts/roofline.py [--batch 16] [--depth 101]
"""
import argparse

PEAK_FLOPS = 197e12  # v5e bf16 MXU peak
PEAK_BW = 819e9      # v5e HBM GB/s
BYTES = 2            # bf16


def conv_cost(n, h, w, cin, cout, k, stride=1, label="", rows=None):
    ho, wo = h // stride, w // stride
    flops = 2 * n * ho * wo * cin * cout * k * k
    in_b = n * h * w * cin * BYTES
    out_b = n * ho * wo * cout * BYTES
    w_b = cin * cout * k * k * BYTES
    t_flop = flops / PEAK_FLOPS
    t_mem = (in_b + out_b + w_b) / PEAK_BW
    if rows is not None:
        rows.append((label, flops, in_b + out_b + w_b, max(t_flop, t_mem),
                     "mxu" if t_flop >= t_mem else "hbm"))
    return max(t_flop, t_mem)


def resnet_fpn(n, h, w, depth, rows):
    # stage spatial sizes (stride 4/8/16/32)
    s4, s8, s16, s32 = (h // 4, w // 4), (h // 8, w // 8), (h // 16, w // 16), (h // 32, w // 32)
    blocks = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[depth]
    t = 0.0
    # stem: 7x7/2, 64ch (space-to-depth folded off-device; compute identical)
    t += conv_cost(n, h, w, 3, 64, 7, 2, "stem 7x7/2", rows)
    # res2: in 256 (first block projects 64->256)
    stage_io = [(64, 256, s4), (256, 512, s8), (512, 1024, s16), (1024, 2048, s32)]
    for si, (cin_stage, cout_stage, (sh, sw)) in enumerate(stage_io):
        nb = blocks[si]
        mid = cout_stage // 4
        for b in range(nb):
            cin = cin_stage if b == 0 else cout_stage
            stride = 2 if (b == 0 and si > 0) else 1
            ih, iw = (sh * 2, sw * 2) if stride == 2 else (sh, sw)
            lbl = f"res{si+2}.{b}"
            t += conv_cost(n, ih, iw, cin, mid, 1, stride, lbl + " 1x1a", rows)
            t += conv_cost(n, sh, sw, mid, mid, 3, 1, lbl + " 3x3", rows)
            t += conv_cost(n, sh, sw, mid, cout_stage, 1, 1, lbl + " 1x1b", rows)
            if b == 0:
                t += conv_cost(n, ih, iw, cin, cout_stage, 1, stride, lbl + " short", rows)
    # FPN: lateral 1x1 (Cs->256) + output 3x3 (256->256) at P2..P5
    for (sh, sw), cs, lvl in [(s4, 256, "p2"), (s8, 512, "p3"), (s16, 1024, "p4"), (s32, 2048, "p5")]:
        t += conv_cost(n, sh, sw, cs, 256, 1, 1, f"fpn {lvl} lat", rows)
        t += conv_cost(n, sh, sw, 256, 256, 3, 1, f"fpn {lvl} out", rows)
    return t


def rpn_head(n, h, w, rows):
    t = 0.0
    for stride, lvl in [(4, "p2"), (8, "p3"), (16, "p4"), (32, "p5"), (64, "p6")]:
        sh, sw = h // stride, w // stride
        t += conv_cost(n, sh, sw, 256, 256, 3, 1, f"rpn {lvl} 3x3", rows)
        t += conv_cost(n, sh, sw, 256, 3, 1, 1, f"rpn {lvl} obj", rows)
        t += conv_cost(n, sh, sw, 256, 12, 1, 1, f"rpn {lvl} dlt", rows)
    return t


def box_head(n, n_box, rows):
    # pooled (7x7x256=12544) -> fc1024 -> fc1024 -> (81 cls + 320 reg)
    t = 0.0
    t += conv_cost(n * n_box, 1, 1, 12544, 1024, 1, 1, "boxhead fc1", rows)
    t += conv_cost(n * n_box, 1, 1, 1024, 1024, 1, 1, "boxhead fc2", rows)
    t += conv_cost(n * n_box, 1, 1, 1024, 401, 1, 1, "predictor", rows)
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--height", type=int, default=832)
    ap.add_argument("--width", type=int, default=1344)
    ap.add_argument("--depth", type=int, default=101)
    ap.add_argument("--boxes", type=int, default=1000)
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args()

    rows = []
    n, h, w = args.batch, args.height, args.width
    t_bb = resnet_fpn(n, h, w, args.depth, rows)
    t_rpn = rpn_head(n, h, w, rows)
    t_box = box_head(n, args.boxes, rows)

    tot_flops = sum(r[1] for r in rows)
    tot_bytes = sum(r[2] for r in rows)
    print(f"batch {n} @ {h}x{w} R-{args.depth}  "
          f"total {tot_flops/1e12:.2f} TFLOP  {tot_bytes/1e9:.2f} GB (ideal)")
    print(f"SOL backbone+FPN {t_bb*1e3:8.2f} ms")
    print(f"SOL rpn head     {t_rpn*1e3:8.2f} ms")
    print(f"SOL box head     {t_box*1e3:8.2f} ms")
    print(f"SOL conv/fc total{(t_bb+t_rpn+t_box)*1e3:8.2f} ms "
          f"({n/(t_bb+t_rpn+t_box):.1f} img/s SOL)")
    mxu = sum(r[3] for r in rows if r[4] == "mxu")
    hbm = sum(r[3] for r in rows if r[4] == "hbm")
    print(f"  mxu-bound ops {mxu*1e3:7.2f} ms   hbm-bound ops {hbm*1e3:7.2f} ms")
    print(f"\ntop {args.top} ops by SOL time:")
    for label, fl, by, t, lim in sorted(rows, key=lambda r: -r[3])[: args.top]:
        print(f"  {label:16s} {t*1e3:7.3f} ms  {lim}  "
              f"{fl/1e9:9.2f} GF  {by/1e6:8.1f} MB  "
              f"({fl/t/1e12:6.1f} TF/s eff)")


if __name__ == "__main__":
    main()
