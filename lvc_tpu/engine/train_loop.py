"""jit-compiled train step over a device mesh.

Replaces the reference's SimpleTrainer.run_step + DDP
(detectron2/engine/train_loop.py:211-250, lvc/engine/defaults.py:326-332):
one traced function computes losses, grads, and the optimizer update; data
parallelism is a ``jax.sharding.Mesh`` with the batch sharded over the
``data`` axis and params replicated — XLA inserts the gradient all-reduce
that DDP/NCCL did by hand.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any

    @classmethod
    def create(cls, variables, tx):
        params = variables["params"]
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
        )


def make_train_step(
    model, tx, mixed_precision: bool = False, axis_name: str = None
) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, metrics).

    ``mixed_precision``: master params stay f32 in the state; the forward
    sees bf16 copies (convs/matmuls run on the MXU in bf16), loss math is
    f32 (fast_rcnn_losses / RPN losses cast logits up), and the cast's VJP
    returns f32 gradients accumulated against the f32 masters — the
    SOLVER.AMP.ENABLED design from VERDICT r1 next #7.

    ``axis_name``: set when the step runs per-shard inside shard_map over a
    data-parallel mesh — gradients and metrics are pmean'd over the axis,
    per-image sampling keys fold in the global image position (so an
    n-device step samples identically to the single-device step on the same
    global batch), and the dropout key decorrelates across shards."""

    def train_step(state: TrainState, batch: Dict, rng: jax.Array):
        from contextlib import nullcontext

        from lvc_tpu.modeling.sampling import sampling_axis_scope

        rng_sampling, rng_dropout = jax.random.split(jax.random.fold_in(rng, state.step))
        if axis_name is not None:
            rng_dropout = jax.random.fold_in(
                rng_dropout, jax.lax.axis_index(axis_name)
            )

        def loss_fn(params):
            from contextlib import nullcontext

            from lvc_tpu.modeling.layers import compute_dtype_scope

            fwd_batch = batch
            scope = nullcontext()
            if mixed_precision:
                bf16 = lambda x: (
                    x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x
                )
                params = jax.tree_util.tree_map(bf16, params)
                fwd_batch = dict(batch)
                for k in ("image", "image_s2d"):
                    if k in fwd_batch:
                        fwd_batch[k] = fwd_batch[k].astype(jnp.bfloat16)
                # layers read the compute dtype at trace time; without this
                # the f32 layer dtype would promote the bf16 casts right back
                scope = compute_dtype_scope(jnp.bfloat16)
            sampling_scope = (
                sampling_axis_scope(axis_name) if axis_name else nullcontext()
            )
            with scope, sampling_scope:
                losses = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    fwd_batch,
                    train=True,
                    rngs={"sampling": rng_sampling, "dropout": rng_dropout},
                )
            losses = {k: v.astype(jnp.float32) for k, v in losses.items()}
            total = sum(losses.values())
            return total, losses

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        if axis_name is not None:
            # Data-parallel all-reduce. Every loss normalizer goes through
            # sampling.global_ratio (psum of numerator and denominator), so
            # each shard's loss VALUE is already the global loss; shard_map
            # autodiff w.r.t. the replicated params then inserts the
            # gradient all-reduce itself (the transpose of broadcasting an
            # invariant operand into shard-varying compute is a psum) — an
            # explicit psum here would double-count by the axis size.
            # Metrics pmean is a no-op for the globalized losses and
            # averages any shard-local aux metric.
            total = jax.lax.pmean(total, axis_name)
            losses = jax.lax.pmean(losses, axis_name)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params, opt_state=opt_state)
        metrics = dict(losses)
        metrics["total_loss"] = total
        return new_state, metrics

    return train_step


def make_data_parallel_train_step(
    model, tx, mesh: Mesh, mixed_precision: bool = False
) -> Callable:
    """jit the train step over the mesh via shard_map: batch sharded on
    'data', state replicated, per-shard step with an explicit gradient
    pmean (the reference's DDP all-reduce).

    shard_map (manual partitioning) rather than GSPMD pjit because the hot
    path contains Mosaic/Pallas kernels (RoIAlign pool, fused residual
    GEMM), which XLA cannot automatically partition — under multi-device
    GSPMD they fail to lower ("wrap the call in a shard_map",
    jax/_src/tpu_custom_call.py). Per-image sampling stays decomposition-
    invariant (see make_train_step axis_name), so an n-device step matches
    the single-device step on the same global batch."""
    step = make_train_step(
        model, tx, mixed_precision=mixed_precision, axis_name="data"
    )
    smapped = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P("data"), P()),
        out_specs=(P(), P()),
        # replication tracking ON: it is what gives psum its correct
        # transpose in autodiff (check_vma=False would double-count the
        # gradient of every global_ratio psum by the axis size)
        check_vma=True,
    )
    return jax.jit(smapped, donate_argnums=(0,))


def _eval_forward(model, bf16: bool = False) -> Callable:
    """bf16=True casts params and image to bfloat16 for the conv/matmul
    path; box math stays f32 because anchors/proposals are f32 (promotion
    rules), so decoded coordinates keep full precision."""

    def eval_step(state: TrainState, batch: Dict):
        params = state.params
        if bf16:
            cast = lambda x: (
                x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x
            )
            params = jax.tree_util.tree_map(cast, params)
            batch = dict(batch)
            for k in ("image", "image_s2d"):
                if k in batch:
                    batch[k] = batch[k].astype(jnp.bfloat16)
        return model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch,
            train=False,
        )

    return eval_step


def make_eval_step(model, bf16: bool = False) -> Callable:
    return jax.jit(_eval_forward(model, bf16))


def make_eval_step_auto(model, bf16: bool = False, devices=None) -> Callable:
    """Eval step spread over local devices: one process drives every chip
    on its host (the reference instead spawns one DDP process per GPU,
    launch.py:24). shard_map (not GSPMD) because inference contains
    Mosaic/Pallas kernels; detection is per-image, so the batch axis
    shards cleanly with no collectives. The mesh adapts per batch size
    (gcd with the device count); pass ``devices`` when the state is
    committed to a submesh (e.g. the trainer's training mesh) so eval
    placement matches it."""
    single = make_eval_step(model, bf16)
    if jax.process_count() > 1:
        # multi-host: a caller-passed mesh may contain non-addressable
        # remote devices, and state committed to the global training mesh
        # cannot be re-placed onto a host-local one — keep the plain jit
        # (computation follows the state's sharding, as before)
        return single
    devices = list(devices) if devices is not None else jax.local_devices()
    if len(devices) <= 1:
        return single
    cache: Dict[int, Callable] = {}

    def step(state: TrainState, batch: Dict):
        import math

        B = jax.tree_util.tree_leaves(batch)[0].shape[0]
        n = math.gcd(B, len(devices))
        if n <= 1:
            return single(state, batch)
        fn = cache.get(n)
        if fn is None:
            mesh = Mesh(np.array(devices[:n]), axis_names=("data",))
            fn = jax.jit(
                jax.shard_map(
                    _eval_forward(model, bf16),
                    mesh=mesh,
                    in_specs=(P(), P("data")),
                    out_specs=P("data"),
                )
            )
            cache[n] = fn
        return fn(state, batch)

    return step


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    """Place a host batch onto the mesh, sharded along the data axis."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
