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
        if p.name and p.name.startswith("_anon_rv_"):
            # unnamed .dist() leaf (reference prints e.g. '<normal>')
            return f"<{type(p.dist).__name__.lower()}>"
        return p.name
    if isinstance(p, DataNode):
        return p.name
    if isinstance(p, DeterministicNode):
        return p.name if p.name else f"f({', '.join(_named_parents(p))})"
    if isinstance(p, Node):
        return "f()"
    arr = np.asarray(p)
    if arr.ndim == 0:
        v = arr.item()
        if isinstance(v, float):
            return f"{v:.4g}"
        return str(v)
    # array params print as an opaque constant (reference printing.py)
    return "<constant>"


def _named_parents(node):
    """Nearest NAMED ancestors of a deterministic/potential expression — the
    'f(alpha, beta)' argument list in the reference's
    'mu = Deterministic(f(alpha, beta))' format."""
    from .graph import _parents

    out, seen = [], set()
    stack = list(_parents(node))
    while stack:
        p = stack.pop(0)
        if id(p) in seen:
            continue
        seen.add(id(p))
        name = getattr(p, "name", None)
        if name and not name.startswith("_anon_rv_"):
            if name not in out:
                out.append(name)
        elif isinstance(p, (FreeRV, ObservedRV)):
            label = f"<{type(p.dist).__name__.lower()}>"
            if label not in out:
                out.append(label)
        else:
            stack.extend(_parents(p))
    return out


def _latex_escape(s):
    return str(s).replace("_", r"\_")


def str_for_dist(rv, formatting="plain", include_params=True):
    """'x ~ Normal(0, 1)' (reference printing.py str_for_dist; the latex
    form mirrors '$x \\sim \\operatorname{Normal}(0,~1)$')."""
    dist = rv.dist if isinstance(rv, (FreeRV, ObservedRV)) else rv
    name = getattr(rv, "name", None) or "<unnamed>"
    dist_name = type(dist).__name__
    params = [_fmt_param(p) for p in dist.param_values()]
    if formatting == "latex":
        ltx_name = _latex_escape(name)
        if include_params:
            body = ",~".join(_latex_escape(p) for p in params)
            return (rf"$\text{{{ltx_name}}} \sim "
                    rf"\operatorname{{{dist_name}}}({body})$")
        return rf"$\text{{{ltx_name}}} \sim \operatorname{{{dist_name}}}$"
    core = f"{dist_name}({', '.join(params)})" if include_params else dist_name
    return f"{name} ~ {core}"


def str_for_model(model, formatting="plain"):
    """Multi-line model description (reference str_for_model)."""
    lines = []
    for rv in model.free_RVs:
        lines.append(str_for_dist(rv, formatting))
    for orv in model.observed_RVs:
        lines.append(str_for_dist(orv, formatting))
    for det in model.deterministics:
        lines.append(str_for_potential_or_deterministic(det, formatting))
    for pot in model.potentials:
        lines.append(
            str_for_potential_or_deterministic(pot, formatting, "Potential")
        )
    return "\n".join(lines)


def str_for_model_latex(model):
    rows = []
    for rv in model.free_RVs + model.observed_RVs:
        dist_name = type(rv.dist).__name__
        params = ",~".join(
            _latex_escape(_fmt_param(p)) for p in rv.dist.param_values()
        )
        rows.append(
            rf"\text{{{_latex_escape(rv.name)}}} &\sim "
            rf"\operatorname{{{dist_name}}}({params})"
        )
    for det in model.deterministics:
        args = _latex_escape(", ".join(_named_parents(det)))
        rows.append(
            rf"\text{{{_latex_escape(det.name)}}} &= "
            rf"\operatorname{{Deterministic}}(f({args}))"
        )
    for pot in model.potentials:
        args = _latex_escape(", ".join(_named_parents(pot)))
        rows.append(
            rf"\text{{{_latex_escape(pot.name)}}} &\sim "
            rf"\operatorname{{Potential}}(f({args}))"
        )
    body = r" \\ ".join(rows)
    return rf"$$\begin{{aligned}} {body} \end{{aligned}}$$"


def str_for_data_var(var, formatting="plain"):
    """One-line description of a pm.Data container (reference printing.py)."""
    shape = tuple(getattr(var, "shape", ()))
    return f"{var.name} = Data(shape={shape}, dtype={getattr(var, 'dtype', '?')})"


def str_for_potential_or_deterministic(var, formatting="plain",
                                       dist_name="Deterministic"):
    """Reference printing.py formats: 'mu = Deterministic(f(alpha, beta))'
    and 'pot ~ Potential(f(mu))' — deterministics use '=', potentials '~'."""
    name = getattr(var, "name", "<unnamed>")
    args = ", ".join(_named_parents(var)) if isinstance(var, Node) else ""
    sep = "=" if dist_name == "Deterministic" else "~"
    return f"{name} {sep} {dist_name}(f({args}))"


def model_table(model, formatting="plain"):
    """Tabular model summary: one row per variable
    (reference printing.py:model_table)."""
    rows = []
    for rv in model.free_RVs:
        rows.append((rv.name, "Free", type(rv.dist).__name__,
                     str(tuple(rv.shape))))
    for orv in model.observed_RVs:
        rows.append((orv.name, "Observed", type(orv.dist).__name__,
                     str(tuple(orv.shape))))
    for det in model.deterministics:
        rows.append((det.name, "Deterministic", "-", str(tuple(det.shape))))
    for dv in model.data_vars:
        rows.append((dv.name, "Data", "-", str(tuple(dv.shape))))
    w = [max(len(r[i]) for r in rows + [("Variable", "Kind", "Distribution",
                                         "Shape")]) for i in range(4)]
    header = ("Variable", "Kind", "Distribution", "Shape")
    lines = ["  ".join(h.ljust(wi) for h, wi in zip(header, w))]
    lines.append("  ".join("-" * wi for wi in w))
    for r in rows:
        lines.append("  ".join(c.ljust(wi) for c, wi in zip(r, w)))
    return "\n".join(lines)


__all__ += ["str_for_data_var", "str_for_potential_or_deterministic",
            "model_table"]


def _wire_reprs():
    """Attach str_repr/_repr_latex_ to Model and RV node classes (reference
    model/core.py:433-434 + :2541-2544 attach these per-instance; class-level
    methods give the same IPython display behavior)."""
    from .model.core import Model

    Model.str_repr = lambda self, formatting="plain": (
        str_for_model_latex(self) if formatting == "latex"
        else str_for_model(self, formatting)
    )
    Model._repr_latex_ = lambda self: str_for_model_latex(self)
    for _cls in (FreeRV, ObservedRV):
        _cls.str_repr = (
            lambda self, formatting="plain", include_params=True:
            str_for_dist(self, formatting, include_params)
        )
        _cls._repr_latex_ = lambda self: str_for_dist(self, "latex")
    DeterministicNode.str_repr = (
        lambda self, formatting="plain", **kw:
        str_for_potential_or_deterministic(self, formatting)
    )


_wire_reprs()
