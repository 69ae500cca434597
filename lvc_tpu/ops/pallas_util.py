"""Shared Pallas helpers.

``out_vma``: under ``jax.shard_map(..., check_vma=True)`` (the DP train
step, engine/train_loop.py), pallas_call output ShapeDtypeStructs must
declare which mesh axes the output varies over — JAX cannot infer it for
opaque kernels. The kernels here are per-box/per-row local ops, so the
output varies over exactly the axes their inputs vary over (the union).
Outside shard_map every input vma is the empty set and the annotation is a
no-op.
"""
import jax

__all__ = ["out_vma"]


def out_vma(*arrays) -> frozenset:
    """Union of the mesh axes the given arrays vary over."""
    vma = frozenset()
    for a in arrays:
        try:
            vma = vma | jax.typeof(a).vma
        except (AttributeError, TypeError):
            pass
    return vma
