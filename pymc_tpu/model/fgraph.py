"""Model <-> graph round-trip with graph surgery.

Parity: reference pymc/model/fgraph.py (fgraph_from_model:139,
model_from_fgraph:301, clone_model:387) — the reference converts a Model into
a PyTensor FunctionGraph so rewrites can edit it, then rebuilds a Model.

TPU-native form: the model already IS a static Node DAG, so the "fgraph" is
an editable view (`ModelGraph`) that records graph edits — node replacements,
variable removals, insertions — and `model_from_fgraph` materializes them
through the structural-cloning engine (model/transform/basic.py::model_map).
This is the same capability (arbitrary graph surgery between capture and
rebuild) without an IR translation layer; the do/observe/deterministic
transforms in model/transform/ are built on the same engine.
"""

from __future__ import annotations

from ..graph import Node, ancestors
from .transform.basic import clone_model, model_map

__all__ = ["ModelGraph", "fgraph_from_model", "model_from_fgraph",
           "clone_model"]


class ModelGraph:
    """Editable capture of a model's Node DAG (the reference's FunctionGraph
    role). Edits are recorded and applied on `model_from_fgraph`:

        fg, memo = fgraph_from_model(model)
        fg.replace(memo["sigma"], pm.HalfNormal.dist(2.0))   # swap a prior
        fg.remove("noisy_det")                               # untrack a var
        new_model = model_from_fgraph(fg)
    """

    def __init__(self, model):
        self.model = model
        self._replacements = {}
        self._drops = set()
        self._inserts = {}

    # ------------------------------------------------------------- inspect
    @property
    def named_vars(self):
        return dict(self.model.named_vars)

    def variables(self):
        """All reachable nodes of the DAG (toposorted ancestors-first)."""
        roots = list(self.model.named_vars.values()) + list(
            self.model.potentials
        )
        return list(ancestors(roots))

    def inputs(self):
        """Leaf nodes (no Node arguments): data containers and constants."""
        return [
            n for n in self.variables()
            if not any(isinstance(a, Node) for a in getattr(n, "args", ()))
        ]

    # ---------------------------------------------------------------- edit
    def replace(self, var, new):
        """Record `var -> new` (old-node consumers are rewired on rebuild).
        `var` may be a node or a model variable name."""
        node = self.model.named_vars[var] if isinstance(var, str) else var
        self._replacements[node] = new
        return self

    def remove(self, name):
        """Untrack a named variable (its replacement — if any — keeps
        feeding downstream consumers)."""
        self._drops.add(str(name))
        return self

    def insert_deterministic(self, name, expr, dims=None):
        """Track a new named expression in the rebuilt model."""
        self._inserts[str(name)] = (expr, dims)
        return self

    def __repr__(self):
        m = self.model
        return (
            f"<ModelGraph free={len(m.free_RVs)} observed="
            f"{len(m.observed_RVs)} deterministics={len(m.deterministics)} "
            f"edits={len(self._replacements) + len(self._drops) + len(self._inserts)}>"
        )


def fgraph_from_model(model, inlined_views=False):
    """Capture the model's graph for editing (reference fgraph.py:139).
    Returns (graph, memo) where memo maps variable names to their nodes —
    the reference's {var: fgraph-var} dictionary keyed by name here."""
    return ModelGraph(model), dict(model.named_vars)


def model_from_fgraph(fgraph, mutate_fgraph=False):
    """Materialize the (possibly edited) graph as an independent Model
    (reference fgraph.py:301)."""
    if not isinstance(fgraph, ModelGraph):
        return clone_model(fgraph)
    new = model_map(
        fgraph.model,
        replace=dict(fgraph._replacements),
        drop=fgraph._drops,
    )
    if fgraph._inserts:
        from ..model.core import Deterministic

        with new:
            for name, (expr, dims) in fgraph._inserts.items():
                Deterministic(name, expr, dims=dims)
    return new
