"""Cross-process (multi-host) communication helpers.

TPU-native counterpart of the reference's ``detectron2/utils/comm.py``
(SURVEY.md §5.8): the NCCL/gloo process groups are replaced by JAX
multi-host collectives over ICI/DCN. Arbitrary-object gathers mirror the
reference's pickle-to-padded-byte-tensor trick (comm.py:83-219) on top of
``multihost_utils.process_allgather``.

Inside-jit collectives (psum of grads, metric reductions) don't live here
— they are part of the pjit-sharded train step. This module is for
host-side orchestration: evaluator shard merging, seeds, barriers.
"""
from __future__ import annotations

import pickle
from typing import Any, List

import numpy as np


def get_world_size() -> int:
    import jax

    return jax.process_count()


def get_rank() -> int:
    import jax

    return jax.process_index()


def is_main_process() -> bool:
    return get_rank() == 0


def synchronize() -> None:
    """Barrier across processes (no-op single-process)."""
    if get_world_size() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("lvc_tpu.comm.synchronize")


def all_gather_objects(obj: Any) -> List[Any]:
    """Gather a picklable object from every process to every process.

    Reference ``comm.all_gather`` (comm.py:139): pickle to bytes, pad to
    the max length across processes, all-gather, unpickle per process.
    """
    world = get_world_size()
    if world == 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL), np.uint8)
    length = np.asarray([payload.size], np.int64)
    all_lengths = np.asarray(multihost_utils.process_allgather(length)).reshape(world)
    max_len = int(all_lengths.max())
    padded = np.zeros(max_len, np.uint8)
    padded[: payload.size] = payload
    gathered = np.asarray(multihost_utils.process_allgather(padded)).reshape(world, max_len)
    return [
        pickle.loads(gathered[r, : int(all_lengths[r])].tobytes()) for r in range(world)
    ]


def gather_objects(obj: Any) -> List[Any]:
    """Gather to the main process; other processes get []. (JAX multi-host
    collectives are symmetric, so this is an all-gather with the result
    dropped off-main — same cost, reference-compatible semantics.)"""
    out = all_gather_objects(obj)
    return out if is_main_process() else []


def shared_random_seed() -> int:
    """All processes agree on a random seed (reference comm.py:220)."""
    seed = np.random.randint(2 ** 31)
    return int(all_gather_objects(seed)[0])


def reduce_dict(d: dict, average: bool = True) -> dict:
    """Average (or sum) scalar values across processes (comm.py:234)."""
    world = get_world_size()
    if world == 1:
        return d
    gathered = all_gather_objects(d)
    out = {}
    for k in d:
        vals = [g[k] for g in gathered]
        out[k] = sum(vals) / world if average else sum(vals)
    return out
