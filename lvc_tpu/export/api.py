"""Model export for deployment.

Counterpart of the reference's ``detectron2/export/`` surface
(api.py:42-163: Caffe2Tracer / export_caffe2_model / export_onnx_model,
torchscript.py) — dormant in LVC but part of the vendored API. The
TPU-native deployment format is **StableHLO via jax.export**: the jitted
inference function is traced once at fixed shapes and serialized to a
self-contained artifact that any XLA runtime (TPU/GPU/CPU, PJRT C API)
can load and execute without Python model code — the same role ONNX /
torchscript play for the reference.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_model(
    model,
    variables,
    example_batch: Dict[str, jnp.ndarray],
    *,
    platforms: Optional[list] = None,
) -> "jax_export.Exported":
    """Trace ``model.apply(variables, batch, train=False)`` at the example
    batch's shapes and return a serializable ``Exported`` (the analogue of
    ``export_caffe2_model(cfg, model, inputs)``, reference api.py:144-161).

    Detections come back as flat arrays (the padded Detections tuple), so
    consumers need no framework types.
    """
    def infer(batch):
        out = model.apply(variables, batch, train=False)
        if hasattr(out, "_asdict"):
            return dict(out._asdict())
        return out

    fn = jax.jit(infer)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = platforms
    return jax_export.export(fn, **kwargs)(example_batch)


def save_exported(exported: "jax_export.Exported", path: str) -> None:
    """Serialize an Exported to a portable artifact file."""
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(data)


def load_exported(path: str) -> "jax_export.Exported":
    """Load an artifact saved by :func:`save_exported`; run it with
    ``loaded.call(batch)`` on any installed backend."""
    with open(path, "rb") as f:
        data = f.read()
    return jax_export.deserialize(bytearray(data))


def export_stablehlo_text(
    model, variables, example_batch: Dict[str, jnp.ndarray]
) -> str:
    """Human-readable StableHLO of the inference program (the analogue of
    the reference's graph-inspection helpers, export/api.py:42-120)."""
    return export_model(model, variables, example_batch).mlir_module()
