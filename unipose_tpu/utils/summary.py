"""Parameter / FLOP audit.

Reference: utils/utils.py:713-829 (``get_model_summary``) counts params and
conv multiply-adds with forward hooks.  The XLA-native equivalent asks the
compiler: ``jax.jit(...).lower(...).compile().cost_analysis()`` reports the
true post-fusion FLOPs of the compiled program — more accurate than hook
arithmetic, and it covers the whole step, not just conv/linear layers.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import jax
import numpy as np


def count_params(params: Mapping[str, Any]) -> int:
    return sum(int(np.size(x)) for x in jax.tree_util.tree_leaves(params))


def per_module_params(params: Mapping[str, Any]) -> Dict[str, int]:
    return {name: count_params(sub) for name, sub in params.items()}


def compiled_flops(fn, *args) -> Optional[float]:
    """FLOPs of the XLA-compiled ``fn(*args)``; None when the backend does
    not report a cost analysis."""
    try:
        analysis = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        return float(analysis.get("flops", float("nan")))
    except Exception:
        return None


def model_summary(model, variables, *sample_args, train: bool = False, **apply_kwargs) -> str:
    """Human-readable param/FLOP report (counterpart of
    utils/utils.py:820-829's totals block)."""
    params = variables.get("params", variables)
    total = count_params(params)
    lines = ["Model Summary", "-" * 60]
    for name, n in sorted(per_module_params(params).items()):
        lines.append(f"{name:<24} {n:>14,} params")
    lines.append("-" * 60)
    lines.append(f"Total Parameters: {total:,}")

    def fwd(*args):
        return model.apply(variables, *args, train=train, **apply_kwargs)

    flops = compiled_flops(fwd, *sample_args)
    if flops is not None and np.isfinite(flops):
        lines.append(
            f"Compiled forward FLOPs: {flops:,.0f} ({flops / 1e9:.2f} GFLOP)"
        )
    return "\n".join(lines)
