"""Model/distribution pretty-printing.

Parity: reference pymc/printing.py (str_for_dist, str_for_model, LaTeX
reprs attached to RVs and Model).
"""

from __future__ import annotations

import numpy as np

from .graph import DataNode, DeterministicNode, FreeRV, Node, ObservedRV

__all__ = ["str_for_dist", "str_for_model", "str_for_model_latex"]


def _fmt_param(p):
    if p is None:
        return "None"
    if isinstance(p, (FreeRV, ObservedRV)):
        return p.name
    if isinstance(p, DataNode):
        return p.name
    if isinstance(p, DeterministicNode):
        return p.name if p.name else "f()"
    if isinstance(p, Node):
        return "f()"
    arr = np.asarray(p)
    if arr.ndim == 0:
        v = arr.item()
        if isinstance(v, float):
            return f"{v:.4g}"
        return str(v)
    return f"<{'x'.join(map(str, arr.shape))}>"


def str_for_dist(rv, formatting="plain", include_params=True):
    """'x ~ Normal(0, 1)' (reference printing.py str_for_dist)."""
    dist = rv.dist if isinstance(rv, (FreeRV, ObservedRV)) else rv
    name = getattr(rv, "name", None) or "<unnamed>"
    dist_name = type(dist).__name__
    if include_params:
        params = ", ".join(_fmt_param(p) for p in dist.param_values())
        core = f"{dist_name}({params})"
    else:
        core = dist_name
    if formatting == "latex":
        return rf"${name} \sim \operatorname{{{dist_name}}}$"
    return f"{name} ~ {core}"


def str_for_model(model, formatting="plain"):
    """Multi-line model description (reference str_for_model)."""
    lines = []
    for rv in model.free_RVs:
        lines.append(str_for_dist(rv, formatting))
    for orv in model.observed_RVs:
        lines.append(str_for_dist(orv, formatting))
    for det in model.deterministics:
        lines.append(f"{det.name} ~ Deterministic")
    for pot in model.potentials:
        lines.append(f"{pot.name} ~ Potential")
    return "\n".join(lines)


def str_for_model_latex(model):
    rows = []
    for rv in model.free_RVs + model.observed_RVs:
        dist_name = type(rv.dist).__name__
        rows.append(
            rf"{rv.name} &\sim \operatorname{{{dist_name}}}"
        )
    for det in model.deterministics:
        rows.append(rf"{det.name} &\sim \operatorname{{Deterministic}}")
    for pot in model.potentials:
        rows.append(rf"{pot.name} &\sim \operatorname{{Potential}}")
    body = r" \\ ".join(rows)
    return rf"$$\begin{{aligned}} {body} \end{{aligned}}$$"
