"""Model <-> graph round-trip.

Parity: reference pymc/model/fgraph.py (fgraph_from_model:155,
model_from_fgraph:310) — the reference converts a Model into a PyTensor
FunctionGraph so rewrites can act on it, then rebuilds. Here the model IS
already a functional Node graph, so the round-trip is structural cloning
(model/transform/basic.py): fgraph_from_model captures the model, and
model_from_fgraph rebuilds an independent copy with fresh nodes.
"""

from __future__ import annotations

from .transform.basic import clone_model

__all__ = ["fgraph_from_model", "model_from_fgraph", "clone_model"]


class _ModelGraph:
    """Opaque handle: (model, memo) — the Node DAG plus bookkeeping."""

    def __init__(self, model):
        self.model = model

    def __repr__(self):
        m = self.model
        return (
            f"<ModelGraph free={len(m.free_RVs)} observed="
            f"{len(m.observed_RVs)} deterministics={len(m.deterministics)}>"
        )


def fgraph_from_model(model, inlined_views=False):
    """Capture the model's graph (reference fgraph.py:155). Returns
    (graph_handle, memo) like the reference's (fgraph, memo)."""
    return _ModelGraph(model), {}


def model_from_fgraph(fgraph, mutate_fgraph=False):
    """Rebuild an independent Model from a captured graph
    (reference fgraph.py:310)."""
    src = fgraph.model if isinstance(fgraph, _ModelGraph) else fgraph
    return clone_model(src)
