"""Model graph visualization.

Parity: reference pymc/model_graph.py:40-908 (model_to_graphviz,
model_to_mermaid, model_to_networkx with plate/dim grouping).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from .graph import DataNode, DeterministicNode, FreeRV, Node, ObservedRV
from .model.core import modelcontext

__all__ = ["ModelGraph", "model_to_graphviz", "model_to_mermaid",
           "model_to_networkx"]


class ModelGraph:
    def __init__(self, model):
        self.model = model

    def _node_parents(self, node):
        """Named-variable parents of a model variable (walking through
        anonymous intermediate nodes)."""
        named = {id(v): v for v in self.model.named_vars.values()}

        if isinstance(node, (FreeRV, ObservedRV)):
            roots = [p for p in node.dist.param_values() if isinstance(p, Node)]
            if isinstance(node, ObservedRV) and isinstance(node.observed, Node):
                roots.append(node.observed)
            tr = getattr(node, "transform", None)
            for attr in ("lower", "upper"):
                b = getattr(tr, attr, None)
                if isinstance(b, Node):
                    roots.append(b)
        elif isinstance(node, DeterministicNode):
            roots = [a for a in node.args if isinstance(a, Node)]
        elif isinstance(node, Node):
            roots = [node] if not isinstance(node, (DataNode,)) else []
        else:
            roots = []

        parents = set()
        seen = set()
        stack = list(roots)
        while stack:
            n = stack.pop()
            if id(n) in seen:
                continue
            seen.add(id(n))
            if id(n) in named and n is not node:
                parents.add(named[id(n)].name)
                continue
            if isinstance(n, DeterministicNode):
                stack.extend(a for a in n.args if isinstance(a, Node))
            elif isinstance(n, (FreeRV, ObservedRV)):
                stack.extend(
                    p for p in n.dist.param_values() if isinstance(p, Node)
                )
        return parents

    def edges(self):
        out = []
        for name, var in self.model.named_vars.items():
            for parent in self._node_parents(var):
                out.append((parent, name))
        for pot in self.model.potentials:
            for parent in self._node_parents(pot):
                out.append((parent, pot.name))
        return sorted(set(out))

    def vars_to_plot(self, var_names=None):
        """Selection semantics of the reference (model_graph.py
        vars_to_plot): the named variables plus their direct parents."""
        if var_names is None:
            return set(self.model.named_vars)
        keep = set(var_names)
        unknown = keep - set(self.model.named_vars)
        if unknown:
            raise KeyError(f"Unknown model variables: {sorted(unknown)}")
        for name in list(keep):
            keep |= self._node_parents(self.model.named_vars[name])
        return keep

    def node_kind(self, var):
        if isinstance(var, FreeRV):
            return "free"
        if isinstance(var, ObservedRV):
            return "observed"
        if isinstance(var, DataNode):
            return "data"
        if var in self.model.potentials:
            return "potential"
        return "deterministic"

    def node_label(self, var):
        kind = self.node_kind(var)
        if kind in ("free", "observed"):
            return f"{var.name}\n~\n{type(var.dist).__name__}"
        if kind == "data":
            return f"{var.name}\n~\nData"
        if kind == "potential":
            return f"{var.name}\n~\nPotential"
        return f"{var.name}\n~\nDeterministic"

    def plates(self):
        """Group variables by their dims/shape (reference plate labels)."""
        groups = defaultdict(list)
        for name, var in self.model.named_vars.items():
            dims = getattr(var, "dims", None)
            shape = tuple(getattr(var, "shape", ()) or ())
            if dims:
                label = " x ".join(
                    f"{d} ({self.model.dim_lengths.get(d, '?')})"
                    for d in dims if d is not None
                )
            elif shape:
                label = " x ".join(str(s) for s in shape)
            else:
                label = ""
            groups[label].append(name)
        return groups


def model_to_graphviz(model=None, *, var_names=None, formatting="plain",
                      save=None, figsize=None, dpi=300):
    """Reference model_graph.py model_to_graphviz."""
    import graphviz

    model = modelcontext(model)
    mg = ModelGraph(model)
    dot = graphviz.Digraph(model.name or "model")
    styles = {
        "free": dict(shape="ellipse"),
        "observed": dict(shape="ellipse", style="filled", fillcolor="grey"),
        "deterministic": dict(shape="box"),
        "data": dict(shape="box", style="rounded"),
        "potential": dict(shape="octagon"),
    }
    keep = mg.vars_to_plot(var_names) if var_names else None
    for label, names in mg.plates().items():
        names = [n for n in names if keep is None or n in keep]
        if not names:
            continue
        if label:
            with dot.subgraph(name=f"cluster_{label}") as sub:
                sub.attr(label=label, labeljust="r", labelloc="b")
                for n in names:
                    var = model.named_vars[n]
                    sub.node(n, mg.node_label(var), **styles[mg.node_kind(var)])
        else:
            for n in names:
                var = model.named_vars[n]
                dot.node(n, mg.node_label(var), **styles[mg.node_kind(var)])
    for a, b in mg.edges():
        if keep is None or (a in keep and b in keep):
            dot.edge(a, b)
    if save is not None:
        dot.render(save, format="png", cleanup=True)
    return dot


def model_to_mermaid(model=None, *, var_names=None):
    """Reference model_to_mermaid."""
    model = modelcontext(model)
    mg = ModelGraph(model)
    keep = mg.vars_to_plot(var_names) if var_names else None
    lines = ["graph TD"]
    for name, var in model.named_vars.items():
        if keep is not None and name not in keep:
            continue
        kind = mg.node_kind(var)
        label = mg.node_label(var).replace("\n", "<br>")
        if kind == "observed":
            lines.append(f'  {name}[("{label}")]')
        elif kind in ("deterministic", "data"):
            lines.append(f'  {name}["{label}"]')
        else:
            lines.append(f'  {name}(("{label}"))')
    for a, b in mg.edges():
        if keep is None or (a in keep and b in keep):
            lines.append(f"  {a} --> {b}")
    return "\n".join(lines)


def model_to_networkx(model=None, *, var_names=None):
    """Reference model_to_networkx."""
    import networkx as nx

    model = modelcontext(model)
    mg = ModelGraph(model)
    keep = mg.vars_to_plot(var_names) if var_names else None
    G = nx.DiGraph()
    for name, var in model.named_vars.items():
        if keep is not None and name not in keep:
            continue
        G.add_node(name, kind=mg.node_kind(var), label=mg.node_label(var))
    for a, b in mg.edges():
        if keep is None or (a in keep and b in keep):
            G.add_edge(a, b)
    return G
