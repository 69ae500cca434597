"""Out-of-memory retry helpers.

Counterpart of detectron2/utils/memory.py (retry_if_cuda_oom). The TPU
analogue: an XLA allocation failure raises ``XlaRuntimeError`` mentioning
RESOURCE_EXHAUSTED; the wrapped function is retried once after clearing
jax's compilation/array caches, then retried on CPU as a last resort
(mirroring the reference's retry-then-CPU ladder).
"""
from __future__ import annotations

import functools
import logging

logger = logging.getLogger(__name__)


def _is_oom(exc: Exception) -> bool:
    text = str(exc)
    return "RESOURCE_EXHAUSTED" in text or "Out of memory" in text or "OOM" in text


def retry_if_oom(func):
    """Decorator/wrapper: call ``func``; on device OOM clear caches and retry
    once; on a second OOM, run on CPU."""

    @functools.wraps(func)
    def wrapped(*args, **kwargs):
        import jax

        try:
            return func(*args, **kwargs)
        except Exception as e:  # jaxlib.xla_extension.XlaRuntimeError etc.
            if not _is_oom(e):
                raise
            logger.warning("OOM in %s; clearing caches and retrying", func.__name__)
            jax.clear_caches()
            try:
                return func(*args, **kwargs)
            except Exception as e2:
                if not _is_oom(e2):
                    raise
                logger.warning("OOM again in %s; retrying on CPU", func.__name__)
                cpu = jax.devices("cpu")[0]

                def to_cpu(t):
                    return jax.device_put(t, cpu) if isinstance(t, jax.Array) else t

                args_cpu = jax.tree_util.tree_map(to_cpu, args)
                kwargs_cpu = jax.tree_util.tree_map(to_cpu, kwargs)
                with jax.default_device(cpu):
                    return func(*args_cpu, **kwargs_cpu)

    return wrapped
