"""Model analysis: parameter and FLOP counting.

Counterpart of detectron2/utils/analysis.py (FlopCountAnalysis /
parameter_count). TPU-native: FLOPs come from XLA's own cost analysis of
the compiled computation — exact for the program that actually runs,
including fusion — rather than per-module handbook formulas.
"""
from __future__ import annotations

from collections import defaultdict
from typing import Callable, Dict

import jax
import numpy as np


def parameter_count(params) -> Dict[str, int]:
    """Parameter counts per top-level module plus "" = total
    (analysis.py parameter_count semantics)."""
    counts: Dict[str, int] = defaultdict(int)

    def visit(path, leaf):
        n = int(np.prod(leaf.shape)) if hasattr(leaf, "shape") else 0
        counts[""] += n
        if path:
            key = str(getattr(path[0], "key", path[0]))
            counts[key] += n
        return leaf

    jax.tree_util.tree_map_with_path(visit, params)
    return dict(counts)


def parameter_count_table(params, max_depth: int = 3) -> str:
    counts = parameter_count(params)
    rows = [("model", counts.pop(""))]
    rows += sorted(counts.items(), key=lambda kv: -kv[1])
    width = max(len(k) for k, _ in rows) + 2
    lines = [f"{'module':<{width}} #params", "-" * (width + 10)]
    for k, v in rows:
        lines.append(f"{k:<{width}} {v / 1e6:.2f}M" if v >= 1e5 else f"{k:<{width}} {v}")
    return "\n".join(lines)


def flop_count(fn: Callable, *args, **kwargs) -> float:
    """Total FLOPs of ``jit(fn)(*args)`` from XLA cost analysis.

    Returns the compiled program's flop count (multiply-adds counted as 2).
    """
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def flop_count_str(fn: Callable, *args, **kwargs) -> str:
    f = flop_count(fn, *args, **kwargs)
    return f"{f / 1e9:.2f} GFLOPs"
