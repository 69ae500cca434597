"""Checkpoint surgery for few-shot fine-tuning (TFA workflow).

Same CLI and semantics as the reference tools/ckpt_surgery.py:
  --method remove           drop the final predictor layers
  --method randinit         re-init a (TAR_SIZE+1)-way classifier /
                            4*TAR_SIZE regressor, copying base-class rows
  --method combine          merge base rows from --src1 and novel rows from
                            --src2 (bg row from base)
  --method combine_parallel rewrite roi_heads.* into parallel base/novel
                            twin heads

Inputs may be torch .pth, d2 .pkl, or this framework's .ckpt; surgery runs
in the reference's (out, in) name space via the converter, and the result
is written as a torch-layout .pth so files interchange with the reference
tooling. Cite: reference tools/ckpt_surgery.py:43-284.
"""
from __future__ import annotations

import argparse
import copy
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lvc_tpu.checkpoint.convert import flax_to_torch, load_torch_checkpoint


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--src1", type=str, default="", help="Path to the main checkpoint")
    parser.add_argument("--src2", type=str, default="", help="Path to the secondary checkpoint")
    parser.add_argument("--save-dir", type=str, default="", help="Save directory")
    parser.add_argument(
        "--method",
        choices=["combine", "remove", "randinit", "combine_parallel"],
        required=True,
    )
    parser.add_argument("--cascade", action="store_true")
    parser.add_argument(
        "--param-name",
        type=str,
        nargs="+",
        default=["roi_heads.box_predictor.cls_score", "roi_heads.box_predictor.bbox_pred"],
    )
    parser.add_argument("--tar-name", type=str, default="model_reset")
    parser.add_argument("--coco", action="store_true")
    parser.add_argument("--lvis", action="store_true")
    return parser.parse_args()


NOVEL_CLASSES_COCO = [1, 2, 3, 4, 5, 6, 7, 9, 16, 17, 18, 19, 20, 21, 44, 62, 63, 64, 67, 72]
BASE_CLASSES_COCO = [
    8, 10, 11, 13, 14, 15, 22, 23, 24, 25, 27, 28, 31, 32, 33, 34, 35, 36, 37,
    38, 39, 40, 41, 42, 43, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58,
    59, 60, 61, 65, 70, 73, 74, 75, 76, 77, 78, 79, 80, 81, 82, 84, 85, 86, 87,
    88, 89, 90,
]


def load_any(path: str) -> dict:
    """-> flat torch-layout numpy state dict."""
    if path.endswith((".pth", ".pkl")):
        return load_torch_checkpoint(path)
    # our msgpack .ckpt: restore raw tree, pull model variables
    from flax import serialization

    with open(path, "rb") as f:
        tree = serialization.msgpack_restore(f.read())
    if "params" in tree:
        variables = {k: tree[k] for k in ("params", "batch_stats") if k in tree}
    elif "model" in tree:
        variables = tree["model"]
    else:
        variables = {"params": tree.get("params", tree)}
        if "batch_stats" in tree:
            variables["batch_stats"] = tree["batch_stats"]
    return flax_to_torch(variables)


def save_pth(sd: dict, path: str):
    import torch

    model = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    torch.save({"model": model, "iteration": 0}, path)
    print(f"save changed ckpt to {path}")


def main():
    args = parse_args()
    rng = np.random.RandomState(0)

    if args.coco:
        novel, base, tar_size = NOVEL_CLASSES_COCO, BASE_CLASSES_COCO, 80
        all_classes = sorted(base + novel)
        idmap = {v: i for i, v in enumerate(all_classes)}
    elif args.lvis:
        # LVIS v0.5: 454 rare (novel) categories out of 1230 contiguous ids
        # (reference tools/ckpt_surgery.py:231-275)
        from lvc_tpu.data.builtin_meta import LVIS_NOVEL_IDS

        novel = list(LVIS_NOVEL_IDS)
        base = [c for c in range(1230) if c not in set(novel)]
        tar_size = 1230
        all_classes = sorted(base + novel)
        idmap = {v: i for i, v in enumerate(all_classes)}
    else:
        novel, base, tar_size, idmap = None, None, 20, None

    sd = load_any(args.src1)
    sd2 = load_any(args.src2) if args.method in ("combine", "combine_parallel") else None

    save_dir = args.save_dir or os.path.dirname(args.src1)
    os.makedirs(save_dir, exist_ok=True)
    suffix = {
        "remove": "remove",
        "randinit": "surgery",
        "combine": "combine",
        "combine_parallel": "combine_parallel",
    }[args.method]
    save_path = os.path.join(save_dir, f"{args.tar_name}_{suffix}.pth")

    if args.method == "remove":
        for pname in args.param_name:
            sd.pop(pname + ".weight", None)
            sd.pop(pname + ".bias", None)
        save_pth(sd, save_path)
        return

    if args.method == "combine_parallel":
        new_sd = {k: copy.deepcopy(v) for k, v in sd.items() if "roi_heads" not in k}
        for k, v in sd.items():
            if "roi_heads" in k:
                new_sd[k.replace("roi_heads", "roi_heads.roi_heads.base")] = copy.deepcopy(v)
        for k, v in sd2.items():
            if "roi_heads" in k:
                new_sd[k.replace("roi_heads", "roi_heads.roi_heads.novel")] = copy.deepcopy(v)
        save_pth(new_sd, save_path)
        return

    tar_sizes = [tar_size + 1, tar_size * 4]
    if args.cascade:
        tar_sizes = [tar_size + 1] * len(args.param_name)

    def one_surgery(pname: str, is_weight: bool, tsize: int):
        wname = pname + (".weight" if is_weight else ".bias")
        if not is_weight and wname not in sd:
            return
        pretrained = sd[wname]
        prev_cls = pretrained.shape[0]
        if "cls_score" in pname:
            prev_cls -= 1
        if is_weight:
            new_w = rng.normal(0, 0.01, size=(tsize, pretrained.shape[1])).astype(
                pretrained.dtype
            )
        else:
            new_w = np.zeros((tsize,), pretrained.dtype)

        if args.coco or args.lvis:
            # copy base-class rows through IDMAP (reference :66-79). The LVIS
            # base detector holds all-class rows, so its source index is the
            # class id itself (reference :67 `idx = i if args.coco else c`).
            for i, c in enumerate(base):
                src = i if args.coco else c
                if "cls_score" in pname:
                    new_w[idmap[c]] = pretrained[src]
                else:
                    new_w[idmap[c] * 4 : (idmap[c] + 1) * 4] = pretrained[src * 4 : (src + 1) * 4]
        else:
            new_w[:prev_cls] = pretrained[:prev_cls]

        if args.method == "combine":
            w2 = sd2[wname]
            if args.coco or args.lvis:
                for i, c in enumerate(novel):
                    if "cls_score" in pname:
                        new_w[idmap[c]] = w2[i]
                    else:
                        new_w[idmap[c] * 4 : (idmap[c] + 1) * 4] = w2[i * 4 : (i + 1) * 4]
            else:
                if "cls_score" in pname:
                    new_w[prev_cls:-1] = w2[:-1]
                else:
                    new_w[prev_cls:] = w2

        if "cls_score" in pname:
            new_w[-1] = pretrained[-1]  # bg row from the base detector
        sd[wname] = new_w

    for pname, tsize in zip(args.param_name, tar_sizes):
        one_surgery(pname, True, tsize)
        one_surgery(pname, False, tsize)
    save_pth(sd, save_path)


if __name__ == "__main__":
    main()
