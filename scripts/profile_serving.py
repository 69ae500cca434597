"""Serving stage budget at the current checkpoint (VERDICT r2 next #5).

Times nested sub-graphs of the R-101 serving model on the real chip:
  (1) backbone (+preprocess)      -> backbone budget
  (2) backbone + RPN proposals    -> (2)-(1) = RPN budget
  (3) full model                  -> (3)-(2) = ROI-heads budget
plus the pool alone on fixed boxes. Device timing forces a scalar
readback per iteration (block_until_ready is unreliable through the axon
tunnel — docs/PERF.md "Measurement note").

Usage: python scripts/profile_serving.py [--batch 16] [--iters 10]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--depth", type=int, default=101)
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

    import __graft_entry__ as g
    from lvc_tpu.modeling.meta_arch.build import build_model

    cfg = g._small_cfg()
    cfg.MODEL.RESNETS.DEPTH = args.depth
    cfg.MODEL.DTYPE = "bfloat16"
    cfg.MODEL.ROI_HEADS.POOLER_IMPL = "pallas_fast"
    model = build_model(cfg)
    B, H, W = args.batch, 832, 1344
    batch = g._make_batch(B=B, H=H, W=W)
    variables = g.fast_init(model, {"params": jax.random.PRNGKey(0)}, batch, train=False)

    def timed(fn, label):
        compiled = jax.jit(fn).lower(batch).compile()
        # warmup
        for _ in range(3):
            out = compiled(batch)
            _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = compiled(batch)
            _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        dt = (time.perf_counter() - t0) / args.iters * 1000
        print(f"{label}: {dt:.2f} ms/batch ({B / dt * 1000:.1f} img/s)")
        return dt

    # (1) backbone only — reduce features to a scalar for readback
    def backbone_only(b):
        feats = model.apply(variables, b, method=model.backbone_features)
        return sum(jnp.sum(f.astype(jnp.float32)) for f in feats.values())

    # (2) backbone + RPN
    def through_rpn(b):
        def run(m, bb):
            feats = m.backbone(
                __import__("lvc_tpu.modeling.meta_arch.rcnn", fromlist=["model_images"]).model_images(m, bb),
                train=False,
            )
            proposals, objectness, valid, _ = m.proposal_generator(
                feats, bb["image_size"], None, None, train=False
            )
            return (
                jnp.sum(proposals.astype(jnp.float32))
                + jnp.sum(objectness.astype(jnp.float32))
                + jnp.sum(valid)
            )

        return model.apply(variables, b, method=run)

    # (3) full model
    def full(b):
        dets = model.apply(variables, b, train=False)
        return jnp.sum(dets.scores) + jnp.sum(dets.boxes)

    t1 = timed(backbone_only, "backbone")
    t2 = timed(through_rpn, "backbone+rpn")
    t3 = timed(full, "full")
    budget = {
        "batch": B,
        "backbone_ms": round(t1, 2),
        "rpn_ms": round(t2 - t1, 2),
        "roi_heads_ms": round(t3 - t2, 2),
        "total_ms": round(t3, 2),
        "img_per_s": round(B / t3 * 1000, 1),
    }
    print(json.dumps(budget))


if __name__ == "__main__":
    main()
