"""Convert a reference checkpoint (.pth / d2-zoo .pkl) to native msgpack.

One command from a reference-trained checkpoint to a file every tool here
loads natively (`MODEL.WEIGHTS path/model_final.ckpt`):

    python -m tools.convert_reference_ckpt \
        --src model_final.pth --dst model_final.ckpt \
        --config-file configs/COCO-detection/faster_rcnn_R_50_FPN_ft_all_30shot_aug_ftmore_dropout.yaml

The conversion itself (name mapping, OIHW->HWIO transposes, FrozenBN
stats, cosine-layer bare weights) is `lvc_tpu/checkpoint/convert.py` —
the mirror of the reference's rename heuristics
(detectron2/checkpoint/c2_model_loading.py, layout documented there).
This CLI adds validation: with --config-file it builds the target model's
variable tree via jax.eval_shape (no compile, no weights materialized) and
cross-checks every converted key and shape, so a converted reference
checkpoint is known-loadable before a long eval run. The output is a
variables-only msgpack ({"params": ..., "batch_stats": ...}) that
DetectionCheckpointer.load overlays onto any TrainState, exactly like the
reference's fvcore name-matched partial load
(lvc/checkpoint/detection_checkpoint.py:46-60).

Note: the checkpointer also converts .pth/.pkl on the fly (MODEL.WEIGHTS
can point straight at the torch file); this tool is for converting once,
validating, and shipping the native artifact.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--src", required=True, help=".pth (torch.save) or .pkl (d2 zoo) checkpoint")
    ap.add_argument("--dst", required=True, help="output .ckpt (msgpack variables)")
    ap.add_argument(
        "--config-file", default="",
        help="validate keys/shapes against the model this config builds",
    )
    ap.add_argument(
        "--allow-partial", action="store_true",
        help="with --config-file: tolerate missing/unexpected keys "
        "(shape mismatches on matched keys always fail)",
    )
    # nargs="*" (not REMAINDER) so flags placed after the first positional
    # override token are still parsed as flags (ADVICE r4)
    ap.add_argument(
        "opts", nargs="*", default=[],
        help="config overrides (KEY VALUE ...) applied after --config-file",
    )
    return ap.parse_args(argv)


def validate_against_config(variables, config_file, opts, allow_partial):
    import jax
    from flax.traverse_util import flatten_dict

    from lvc_tpu.config import get_cfg
    from lvc_tpu.modeling.meta_arch.build import build_model

    import __graft_entry__ as g

    cfg = get_cfg()
    cfg.merge_from_file(config_file)
    if opts:
        cfg.merge_from_list(opts)
    model = build_model(cfg)
    batch = g._make_batch(B=1, H=128, W=128)
    template = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    )

    ok = True
    for col in ("params", "batch_stats"):
        want = flatten_dict(template.get(col, {}))
        have = flatten_dict(variables.get(col, {}))
        for k in sorted(set(want) - set(have)):
            print(f"[convert] missing in checkpoint ({col}): {'/'.join(k)}")
            ok = ok and allow_partial
        for k in sorted(set(have) - set(want)):
            print(f"[convert] unexpected in checkpoint ({col}): {'/'.join(k)}")
            ok = ok and allow_partial
        for k in sorted(set(want) & set(have)):
            ws, hs = tuple(want[k].shape), tuple(np.asarray(have[k]).shape)
            if ws != hs:
                print(f"[convert] SHAPE MISMATCH ({col}) {'/'.join(k)}: ckpt {hs} vs model {ws}")
                ok = False
    return ok


def main(argv=None):
    args = parse_args(argv)
    from flax import serialization

    from lvc_tpu.checkpoint.convert import load_torch_checkpoint, torch_to_flax

    sd = load_torch_checkpoint(args.src)
    variables = torch_to_flax(sd)
    n_params = sum(
        int(np.prod(np.asarray(v).shape))
        for v in __import__("jax").tree_util.tree_leaves(variables.get("params", {}))
    )
    print(f"[convert] {args.src}: {len(sd)} tensors -> "
          f"{n_params / 1e6:.1f} M params"
          + (", batch_stats present" if variables.get("batch_stats") else ""))

    if args.config_file:
        if not validate_against_config(
            variables, args.config_file, args.opts, args.allow_partial
        ):
            print("[convert] validation FAILED (see messages above); "
                  "use --allow-partial to write anyway with missing/extra keys")
            return 1
        print("[convert] validation OK against", args.config_file)

    host = __import__("jax").tree_util.tree_map(np.asarray, variables)
    # explicit format marker so the checkpointer branches on it instead of
    # inferring "variables-only" from an absent opt_state (ADVICE r4)
    host = dict(host)
    host["__format__"] = np.frombuffer(b"variables", dtype=np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(args.dst)), exist_ok=True)
    with open(args.dst, "wb") as f:
        f.write(serialization.msgpack_serialize(host))
    print(f"[convert] wrote {args.dst} ({os.path.getsize(args.dst) / 1e6:.1f} MB)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
