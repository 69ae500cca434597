"""Checkpoint save/load/resume.

Counterpart of the reference's fvcore Checkpointer stack
(lvc/checkpoint/detection_checkpoint.py:9, PeriodicCheckpointer hook).
Native format is a single msgpack file holding
{model variables, optimizer state, iteration}; torch ``.pth`` / d2-zoo
``.pkl`` checkpoints load through the converter (convert.py).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

from lvc_tpu.checkpoint.convert import load_torch_checkpoint, torch_to_flax


class DetectionCheckpointer:
    def __init__(self, state_template, save_dir: str = ""):
        """state_template: a TrainState (or variables dict) providing the
        pytree structure for restore."""
        self.template = state_template
        self.save_dir = save_dir

    # ------------------------------------------------------------------ save
    def save(self, name: str, state) -> str:
        os.makedirs(self.save_dir, exist_ok=True)
        path = os.path.join(self.save_dir, f"{name}.ckpt")
        host_state = jax.tree_util.tree_map(np.asarray, state)
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(host_state))
        with open(os.path.join(self.save_dir, "last_checkpoint"), "w") as f:
            f.write(f"{name}.ckpt")
        return path

    # ------------------------------------------------------------------ load
    def load(self, path: str, state=None):
        """Load into the template structure. torch/pkl files update only the
        model variables (params/batch_stats), like the reference's
        name-matched partial load."""
        state = state if state is not None else self.template
        if path.endswith((".pth", ".pkl")):
            return self._load_torch_into(path, state)
        with open(path, "rb") as f:
            data = f.read()
        restored = serialization.msgpack_restore(data)
        # variables-only checkpoints (tools/convert_reference_ckpt.py output)
        # overlay onto the state like a converted torch file does. Primary
        # signal: the explicit "__format__" marker the converter writes
        # since round 5 (ADVICE r4); the opt_state-absence inference is kept
        # for older converted files.
        if isinstance(restored, dict):
            fmt = restored.pop("__format__", None)
            is_variables = (
                fmt is not None
                and bytes(np.asarray(fmt)) == b"variables"
            ) or (
                fmt is None
                and "params" in restored
                and "opt_state" not in restored
            )
            if is_variables and hasattr(state, "params"):
                return self.apply_variables(state, restored)
        return serialization.from_state_dict(state, restored)

    def _load_torch_into(self, path: str, state):
        sd = load_torch_checkpoint(path)
        variables = torch_to_flax(sd)
        return self.apply_variables(state, variables)

    @staticmethod
    def apply_variables(state, variables: Dict):
        """Overlay converted variables onto a TrainState, warning on
        missing/unexpected keys (c2_model_loading-style partial load)."""
        from flax.traverse_util import flatten_dict, unflatten_dict

        def overlay(target, incoming, label):
            tflat = flatten_dict(target)
            iflat = flatten_dict(incoming)
            missing = set(tflat) - set(iflat)
            unexpected = set(iflat) - set(tflat)
            for k in unexpected:
                print(f"[checkpoint] unexpected key in {label}: {'/'.join(k)}")
            for k in sorted(missing):
                print(f"[checkpoint] missing key in {label} (kept init): {'/'.join(k)}")
            out = dict(tflat)
            for k, v in iflat.items():
                if k in tflat:
                    tv = tflat[k]
                    if tuple(v.shape) != tuple(tv.shape):
                        raise ValueError(
                            f"shape mismatch for {'/'.join(k)}: ckpt {v.shape} vs model {tv.shape}"
                        )
                    out[k] = jax.numpy.asarray(v, dtype=tv.dtype)
            return unflatten_dict(out)

        new_params = overlay(state.params, variables.get("params", {}), "params")
        new_stats = state.batch_stats
        if variables.get("batch_stats"):
            new_stats = overlay(state.batch_stats, variables["batch_stats"], "batch_stats")
        return state.replace(params=new_params, batch_stats=new_stats)

    # ------------------------------------------------------------ resume API
    def has_checkpoint(self) -> bool:
        return os.path.exists(os.path.join(self.save_dir, "last_checkpoint"))

    def get_checkpoint_file(self) -> Optional[str]:
        f = os.path.join(self.save_dir, "last_checkpoint")
        if not os.path.exists(f):
            return None
        with open(f) as fp:
            return os.path.join(self.save_dir, fp.read().strip())

    def resume_or_load(self, path: str, state, resume: bool = True):
        """resume=True and a last_checkpoint exists -> restore full training
        state; otherwise load model weights from ``path``
        (lvc/engine/defaults.py:351-364 semantics)."""
        if resume and self.has_checkpoint():
            return self.load(self.get_checkpoint_file(), state), True
        if path:
            return self.load(path, state), False
        return state, False
