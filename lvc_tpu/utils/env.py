"""Environment helpers.

Counterpart of detectron2/utils/env.py (seed_all_rng) and
collect_env.py (environment report) for the JAX stack.
"""
from __future__ import annotations

import datetime
import os
import random
import sys

import numpy as np


def seed_all_rng(seed: int | None = None) -> int:
    """Seed numpy + python RNGs; returns the seed (env.py:seed_all_rng).
    jax PRNG keys are derived explicitly from this seed by callers —
    jax has no global RNG to seed."""
    if seed is None:
        seed = (
            os.getpid()
            + int(datetime.datetime.now().strftime("%S%f"))
            + int.from_bytes(os.urandom(2), "big")
        )
    seed = int(seed) % (2 ** 31)
    np.random.seed(seed)
    random.seed(seed)
    os.environ.setdefault("PYTHONHASHSEED", str(seed))
    return seed


def collect_env_info() -> str:
    """Human-readable environment report (collect_env.py)."""
    import jax

    lines = [
        f"sys.platform: {sys.platform}",
        f"python: {sys.version.splitlines()[0]}",
        f"numpy: {np.__version__}",
        f"jax: {jax.__version__}",
    ]
    try:
        import jaxlib

        lines.append(f"jaxlib: {jaxlib.__version__}")
    except ImportError:
        pass
    try:
        import flax

        lines.append(f"flax: {flax.__version__}")
    except ImportError:
        pass
    try:
        import optax

        lines.append(f"optax: {optax.__version__}")
    except ImportError:
        pass
    try:
        devices = jax.devices()
        lines.append(f"devices: {devices}")
        lines.append(f"default backend: {jax.default_backend()}")
    except Exception as e:  # no backend in some build envs
        lines.append(f"devices: unavailable ({e})")
    lines.append(f"XLA_FLAGS: {os.environ.get('XLA_FLAGS', '')}")
    return "\n".join(lines)
