"""Optimizer + LR schedule construction.

Counterpart of detectron2/solver/build.py (build_optimizer:93 — SGD with
per-param lr/weight-decay groups; build_lr_scheduler:140) and
lr_scheduler.py (WarmupMultiStepLR:16, WarmupCosineLR:52). TPU-first
differences: momentum-SGD is an optax chain; the reference's
requires_grad=False freezing (config FREEZE flags, lvc defaults.py:84-92)
becomes an explicit trainability mask applied with optax.masked — frozen
subtrees (and all FrozenBN affines) receive zero updates.
"""
from __future__ import annotations

import math
from typing import Callable, Dict, List

import jax
import jax.numpy as jnp
import optax


# ----------------------------------------------------------------- schedules
def warmup_factor_at(method: str, it: jnp.ndarray, warmup_iters: int, warmup_factor: float):
    """d2 _get_warmup_factor_at_iter (lr_scheduler.py:90-110)."""
    if warmup_iters <= 0:
        return jnp.ones_like(jnp.asarray(it, jnp.float32))
    it = jnp.asarray(it, jnp.float32)
    if method == "constant":
        f = jnp.full_like(it, warmup_factor)
    elif method == "linear":
        alpha = it / warmup_iters
        f = warmup_factor * (1.0 - alpha) + alpha
    else:
        raise ValueError(f"Unknown warmup method: {method}")
    return jnp.where(it >= warmup_iters, 1.0, f)


def warmup_multistep_lr(
    base_lr: float,
    steps: List[int],
    gamma: float = 0.1,
    warmup_factor: float = 1.0 / 1000,
    warmup_iters: int = 1000,
    warmup_method: str = "linear",
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    steps = list(steps)

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        n_passed = sum(jnp.where(count >= s, 1.0, 0.0) for s in steps)
        wf = warmup_factor_at(warmup_method, count, warmup_iters, warmup_factor)
        return base_lr * wf * gamma ** n_passed

    return schedule


def warmup_cosine_lr(
    base_lr: float,
    max_iters: int,
    warmup_factor: float = 1.0 / 1000,
    warmup_iters: int = 1000,
    warmup_method: str = "linear",
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        wf = warmup_factor_at(warmup_method, count, warmup_iters, warmup_factor)
        return base_lr * wf * 0.5 * (1.0 + jnp.cos(jnp.pi * count / max_iters))

    return schedule


def build_lr_schedule(cfg) -> Callable[[jnp.ndarray], jnp.ndarray]:
    name = cfg.SOLVER.LR_SCHEDULER_NAME
    if name == "WarmupMultiStepLR":
        return warmup_multistep_lr(
            cfg.SOLVER.BASE_LR,
            list(cfg.SOLVER.STEPS),
            cfg.SOLVER.GAMMA,
            cfg.SOLVER.WARMUP_FACTOR,
            cfg.SOLVER.WARMUP_ITERS,
            cfg.SOLVER.WARMUP_METHOD,
        )
    if name == "WarmupCosineLR":
        return warmup_cosine_lr(
            cfg.SOLVER.BASE_LR,
            cfg.SOLVER.MAX_ITER,
            cfg.SOLVER.WARMUP_FACTOR,
            cfg.SOLVER.WARMUP_ITERS,
            cfg.SOLVER.WARMUP_METHOD,
        )
    raise ValueError(f"Unknown LR scheduler: {name}")


# ------------------------------------------------------------------- masking
def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def trainability_mask(params, cfg) -> Dict:
    """True = trainable. Encodes the reference freeze flags:
    - FrozenBatchNorm affines are never trainable (d2 buffers)
    - BACKBONE.FREEZE / FREEZE_BOTTOM_UP (lvc defaults.py:84-85)
    - BACKBONE.FREEZE_AT stages (resnet.py:741)
    - PROPOSAL_GENERATOR.FREEZE (:86)
    - ROI_HEADS.FREEZE_FEAT (box head) (:87)
    - ROI_HEADS.FREEZE_BBOX_PRED (:89)
    """
    freeze_at = cfg.MODEL.BACKBONE.FREEZE_AT

    def decide(path, _):
        p = _path_str(path)
        if "FrozenBatchNorm" in p:
            return False
        if cfg.MODEL.BACKBONE.FREEZE and p.startswith("backbone/"):
            return False
        if cfg.MODEL.BACKBONE.FREEZE_BOTTOM_UP and p.startswith("backbone/bottom_up/"):
            return False
        if freeze_at >= 1 and "backbone/bottom_up/stem/" in p:
            return False
        for stage in range(2, 6):
            if freeze_at >= stage and f"backbone/bottom_up/res{stage}." in p:
                return False
        if cfg.MODEL.PROPOSAL_GENERATOR.FREEZE and p.startswith("proposal_generator/"):
            return False
        if cfg.MODEL.ROI_HEADS.FREEZE_FEAT and "roi_heads/box_head/" in p:
            return False
        if cfg.MODEL.ROI_HEADS.FREEZE_BBOX_PRED and "bbox_pred" in p:
            return False
        return True

    return jax.tree_util.tree_map_with_path(decide, params)


def _wd_group_masks(params):
    """Split params into (bias, norm-affine, other) like d2 build_optimizer."""

    def is_bias(path, _):
        p = _path_str(path)
        return p.endswith("/bias") and "Norm" not in p

    def is_norm(path, _):
        p = _path_str(path)
        return ("GroupNorm" in p or "SyncBatchNorm" in p or "FrozenBatchNorm" in p)

    bias_mask = jax.tree_util.tree_map_with_path(is_bias, params)
    norm_mask = jax.tree_util.tree_map_with_path(is_norm, params)
    other_mask = jax.tree_util.tree_map(
        lambda b, n: not (b or n), bias_mask, norm_mask
    )
    return bias_mask, norm_mask, other_mask


def build_optimizer(cfg, params) -> optax.GradientTransformation:
    """SGD + momentum with d2's weight-decay groups and freeze masks.

    Matches torch.optim.SGD semantics: wd added to grad, then momentum,
    then lr (solver/build.py:93-139).
    """
    schedule = build_lr_schedule(cfg)
    bias_mask, norm_mask, other_mask = _wd_group_masks(params)

    chain = []
    # clipping first: the reference clips RAW gradients (a hook before
    # optimizer.step, d2 build.py:61-90); weight decay is added inside the
    # SGD step, i.e. after clipping
    if cfg.SOLVER.CLIP_GRADIENTS.ENABLED:
        if cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE == "value":
            chain.append(optax.clip(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE))
        else:
            chain.append(optax.clip_by_global_norm(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE))
    if cfg.SOLVER.WEIGHT_DECAY:
        chain.append(
            optax.masked(optax.add_decayed_weights(cfg.SOLVER.WEIGHT_DECAY), other_mask)
        )
    if cfg.SOLVER.WEIGHT_DECAY_BIAS:
        chain.append(
            optax.masked(optax.add_decayed_weights(cfg.SOLVER.WEIGHT_DECAY_BIAS), bias_mask)
        )
    if cfg.SOLVER.WEIGHT_DECAY_NORM:
        chain.append(
            optax.masked(optax.add_decayed_weights(cfg.SOLVER.WEIGHT_DECAY_NORM), norm_mask)
        )
    if cfg.SOLVER.MOMENTUM:
        chain.append(optax.trace(decay=cfg.SOLVER.MOMENTUM, nesterov=cfg.SOLVER.NESTEROV))
    chain.append(optax.scale_by_learning_rate(schedule))

    tx = optax.chain(*chain)
    mask = trainability_mask(params, cfg)
    # zero out updates for frozen leaves
    return optax.chain(
        optax.masked(tx, mask),
        optax.masked(optax.set_to_zero(), jax.tree_util.tree_map(lambda t: not t, mask)),
    )


def build_clip_optimizer(cfg, params) -> optax.GradientTransformation:
    """build_optimizer plus a reduced backbone learning rate: parameters
    under ``backbone/bottom_up`` step at SOLVER.CLIP_LR instead of BASE_LR
    (tools/train_net_qe_ig.py:51-99 — the CLIP-backbone finetune recipe).
    Implemented as a post-scale on the bottom-up subtree, so the wd/momentum
    chain is shared with the standard optimizer."""
    base = build_optimizer(cfg, params)
    ratio = cfg.SOLVER.CLIP_LR / max(cfg.SOLVER.BASE_LR, 1e-12)

    def is_bottom_up(path, _):
        return _path_str(path).startswith("backbone/bottom_up/")

    bu_mask = jax.tree_util.tree_map_with_path(is_bottom_up, params)
    return optax.chain(base, optax.masked(optax.scale(ratio), bu_mask))
