"""torch/d2 checkpoint <-> flax variables conversion.

Counterpart of lvc/checkpoint/detection_checkpoint.py and d2's
c2_model_loading rename heuristics: maps the reference's state_dict names
(backbone.bottom_up.res2.0.conv1.{weight,norm.*}, rpn_head.*,
roi_heads.box_head.fc1.*, box_predictor.*) onto our flax tree (which was
deliberately laid out with the same module names), transposing conv
kernels OIHW->HWIO and linear weights (out,in)->(in,out).
"""
from __future__ import annotations

import pickle
import re
from typing import Dict, Tuple

import numpy as np

_RES_STAGE = re.compile(r"res\d")
from flax.traverse_util import flatten_dict, unflatten_dict


def _to_numpy(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def torch_to_flax(state_dict: Dict[str, np.ndarray]) -> Dict:
    """d2-style state_dict -> {'params': ..., 'batch_stats': ...} with
    '/'-joined keys unflattened into the flax tree."""
    params: Dict[Tuple[str, ...], np.ndarray] = {}
    stats: Dict[Tuple[str, ...], np.ndarray] = {}

    for key, val in state_dict.items():
        v = _to_numpy(val)
        if key.startswith("model."):
            key = key[len("model.") :]
        if key in ("pixel_mean", "pixel_std"):
            continue
        # d2 stores anchor grids as buffers (anchor_generator.cell_anchors.N);
        # we recompute them from config
        if "anchor_generator.cell_anchors" in key:
            continue
        parts = key.split(".")
        # our flax stage blocks are named "res2.0" etc.; re-fuse the stage
        # name with its numeric block index after splitting on "."
        fused = []
        for p in parts:
            if fused and _RES_STAGE.fullmatch(fused[-1]) and p.isdigit():
                fused[-1] = fused[-1] + "." + p
            elif fused and fused[-1] in ("box_head", "box_predictor") and p.isdigit():
                # cascade ModuleList stages (lvc cascade_rcnn.py:69-80):
                # box_head.0 -> our per-stage flax name box_head_0
                fused[-1] = fused[-1] + "_" + p
            else:
                fused.append(p)
        parts = fused
        name = parts[-1]
        mod = parts[:-1]

        # FrozenBN stats/affine: "....norm.weight" etc.
        if len(mod) >= 1 and mod[-1] == "norm":
            base = mod[:-1] + ["FrozenBatchNorm_0"]
            if name in ("weight", "bias"):
                params[tuple(base + [name])] = v
            elif name in ("running_mean", "running_var"):
                stats[tuple(base + [name])] = v
            elif name == "num_batches_tracked":
                pass
            else:
                raise KeyError(f"Unrecognized norm key: {key}")
            continue

        if name == "weight":
            if v.ndim == 4:  # conv OIHW -> HWIO
                params[tuple(mod + ["conv", "kernel"])] = v.transpose(2, 3, 1, 0)
            elif v.ndim == 2:  # linear (out,in) -> (in,out)
                if mod[-1] == "cls_score" and _is_cosine_hint(state_dict, mod):
                    # cosine layer keeps a bare weight param
                    params[tuple(mod[:-1] + ["cls_score_weight"])] = v.T
                else:
                    params[tuple(mod + ["kernel"])] = v.T
            elif v.ndim == 1:
                params[tuple(mod + ["weight"])] = v
            else:
                raise ValueError(f"Unhandled weight ndim for {key}: {v.shape}")
        elif name == "bias":
            w_key = ".".join(parts[:-1]) + ".weight"
            w = state_dict.get(w_key)
            if w is not None and _to_numpy(w).ndim == 4:
                # conv bias lives under the Conv2d wrapper's child
                params[tuple(mod + ["conv", "bias"])] = v
            else:
                params[tuple(mod + ["bias"])] = v
        elif name in ("running_mean", "running_var"):
            stats[tuple(mod + [name])] = v
        elif name == "num_batches_tracked":
            pass
        else:
            params[tuple(mod + [name])] = v

    out = {"params": unflatten_dict(params)}
    if stats:
        out["batch_stats"] = unflatten_dict(stats)
    return out


def _is_cosine_hint(state_dict, mod) -> bool:
    """CosineSimOutputLayers' cls_score has no bias (fast_rcnn.py:777)."""
    return ".".join(mod) + ".bias" not in state_dict


def flax_to_torch(variables: Dict) -> Dict[str, np.ndarray]:
    """Inverse mapping for exporting our weights in the reference layout."""
    out: Dict[str, np.ndarray] = {}
    params = flatten_dict(variables.get("params", {}))
    stats = flatten_dict(variables.get("batch_stats", {}))

    _cascade = re.compile(r"(box_head|box_predictor)_(\d+)")

    def _unfuse(parts):
        return [
            _cascade.fullmatch(p).expand(r"\1.\2") if _cascade.fullmatch(p) else p
            for p in parts
        ]

    for path, v in params.items():
        v = np.asarray(v)
        parts = _unfuse(list(path))
        if parts[-1] == "kernel" and parts[-2] == "conv":
            out[".".join(parts[:-2]) + ".weight"] = v.transpose(3, 2, 0, 1)
        elif parts[-1] == "bias" and parts[-2] == "conv":
            out[".".join(parts[:-2]) + ".bias"] = v
        elif parts[-1] == "kernel":
            out[".".join(parts[:-1]) + ".weight"] = v.T
        elif parts[-1] == "cls_score_weight":
            out[".".join(parts[:-1]) + ".cls_score.weight"] = v.T
        elif parts[-2] == "FrozenBatchNorm_0":
            out[".".join(parts[:-2]) + ".norm." + parts[-1]] = v
        else:
            out[".".join(parts)] = v
    for path, v in stats.items():
        parts = _unfuse(list(path))
        assert parts[-2] == "FrozenBatchNorm_0", path
        out[".".join(parts[:-2]) + ".norm." + parts[-1]] = np.asarray(v)
    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth (torch.save) or .pkl (d2 zoo) checkpoint into a flat
    numpy state_dict."""
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        sd = data.get("model", data)
        return {k: np.asarray(v) for k, v in sd.items() if isinstance(v, np.ndarray) or hasattr(v, "shape")}
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    sd = data.get("model", data)
    return {k: _to_numpy(v) for k, v in sd.items()}
