"""Model cloning — the foundation of model-as-data transforms.

Parity: reference pymc/model/fgraph.py (fgraph_from_model:139 /
model_from_fgraph:301 / clone_model:387). The reference round-trips through a
marker-op FunctionGraph; here the model's Node DAG is cloned structurally
with a replacement map — same capability (graph surgery on models), no IR.
"""

from __future__ import annotations

import copy

import numpy as np
import jax.numpy as jnp

from ...graph import (
    ConstantNode,
    DataNode,
    DeterministicNode,
    FreeRV,
    Node,
    ObservedRV,
)
from ..core import Model

__all__ = ["clone_model", "model_map", "prune_vars_detached_from_observed",
           "remove_minibatched_nodes"]


def _clone_dist(dist, memo, replace):
    new = object.__new__(type(dist))
    for k, v in dist.__dict__.items():
        if isinstance(v, Node):
            new.__dict__[k] = _clone_node(v, memo, replace)
        elif isinstance(v, (list, tuple)) and any(isinstance(x, Node) for x in v):
            new.__dict__[k] = type(v)(
                _clone_node(x, memo, replace) if isinstance(x, Node) else x
                for x in v
            )
        elif hasattr(v, "param_values") and hasattr(v, "logp"):
            # nested Distribution (Mixture components, Censored base, ...)
            new.__dict__[k] = _clone_dist(v, memo, replace)
        else:
            new.__dict__[k] = v
    return new


def _clone_transform(tr, memo, replace):
    if tr is None:
        return None
    new = copy.copy(tr)
    for attr in ("lower", "upper"):
        v = getattr(tr, attr, None)
        if isinstance(v, Node):
            setattr(new, attr, _clone_node(v, memo, replace))
    return new


def _clone_node(node, memo, replace):
    if id(node) in replace:
        # clone the REPLACEMENT through the same memo: if it is (or contains)
        # a node of this model (e.g. remove_minibatched_nodes swapping a
        # minibatch view for its full pm.Data source), every reference must
        # resolve to the clone's single copy — injecting the original
        # verbatim would leave TWO DataNodes named 'y', and set_data on the
        # clone would update the one the graph doesn't read
        rep = replace[id(node)]
        if isinstance(rep, Node):
            return _clone_node(rep, memo, {})
        return rep
    if id(node) in memo:
        return memo[id(node)]
    if isinstance(node, ConstantNode):
        out = node  # immutable, shareable
    elif isinstance(node, DataNode):
        out = DataNode(node.name, node.get_value(), dims=node.dims)
        if getattr(node, "is_minibatch", False):
            out.is_minibatch = True
    elif isinstance(node, FreeRV):
        dist = _clone_dist(node.dist, memo, replace)
        out = FreeRV(
            node.name, dist, node.shape, node.dtype,
            transform=None, model=None,
        )
        memo[id(node)] = out  # register before transform (cycle safety)
        out.transform = _clone_transform(node.transform, memo, replace)
        out.dims = getattr(node, "dims", None)
        return out
    elif isinstance(node, ObservedRV):
        dist = _clone_dist(node.dist, memo, replace)
        obs = (
            _clone_node(node.observed, memo, replace)
            if isinstance(node.observed, Node) else node.observed
        )
        out = ObservedRV(node.name, dist, obs, mask=node.mask)
        out.scale = getattr(node, "scale", 1.0)
        out.dims = getattr(node, "dims", None)
    elif isinstance(node, DeterministicNode):
        args = tuple(
            _clone_node(a, memo, replace) if isinstance(a, Node) else a
            for a in node.args
        )
        out = DeterministicNode(node.fn, args, node.kwargs, name=node.name)
        out.dims = getattr(node, "dims", None)
    else:
        # custom node types (MinibatchIndexNode etc.): shallow copy
        out = copy.copy(node)
    memo[id(node)] = out
    return out


def model_map(model, replace=None, drop=(), extra_observed=None):
    """Clone `model` applying node replacements.

    replace: {old_node_or_name: new Node} — downstream references are rewired.
    drop: names to omit from the clone's registries (their replacements keep
    feeding downstream consumers).
    """
    replace = replace or {}
    rep_by_id = {}
    for k, v in replace.items():
        node = model.named_vars[k] if isinstance(k, str) else k
        rep_by_id[id(node)] = v
    drop = set(drop)
    memo = {}

    new = Model(name=model.name)
    for name, var in model.named_vars.items():
        cloned = _clone_node(var, memo, rep_by_id)
        if name in drop or id(var) in rep_by_id:
            continue
        if isinstance(cloned, FreeRV):
            cloned.model = new
            new.free_RVs.append(cloned)
            new.named_vars[name] = cloned
        elif isinstance(cloned, ObservedRV):
            cloned.model = new
            new.observed_RVs.append(cloned)
            new.named_vars[name] = cloned
        elif isinstance(cloned, DataNode):
            new.data_vars.append(cloned)
            new.named_vars[name] = cloned
        elif var in model.potentials:
            new.potentials.append(cloned)
            new.named_vars[name] = cloned
        else:
            new.deterministics.append(cloned)
            new.named_vars[name] = cloned
    # rewire potentials that are plain Nodes not in named_vars
    for pot in model.potentials:
        if pot.name not in new.named_vars:
            cloned = _clone_node(pot, memo, rep_by_id)
            new.potentials.append(cloned)
    new._coords.update(model._coords)
    new._dim_lengths.update(model._dim_lengths)
    new.rvs_to_initial_values.update(model.rvs_to_initial_values)
    return new


def clone_model(model):
    """Deep-copy a model (reference fgraph.py clone_model:387)."""
    return model_map(model)


def prune_vars_detached_from_observed(model):
    """Drop free RVs with no path to any observed RV (reference
    model/transform/basic.py:33)."""
    from ...graph import ancestors

    keep = set()
    roots = []
    for orv in model.observed_RVs:
        roots.append(orv)
        roots.extend(p for p in orv.dist.param_values() if isinstance(p, Node))
        if isinstance(orv.observed, Node):
            roots.append(orv.observed)
    roots.extend(model.potentials)
    for n in ancestors(roots):
        if isinstance(n, FreeRV):
            keep.add(n.name)
    drop = [rv.name for rv in model.free_RVs if rv.name not in keep]
    # also drop deterministics that depend on dropped RVs
    new = model_map(model, drop=drop)
    new.free_RVs = [rv for rv in new.free_RVs if rv.name in keep]
    bad = set(drop)
    new.deterministics = [
        d for d in new.deterministics
        if not any(
            isinstance(a, FreeRV) and a.name in bad
            for a in ancestors([d])
        )
    ]
    return new


def remove_minibatched_nodes(model):
    """Replace EVERY Minibatch view in the graph by its full data source —
    observed values AND dist parameters / deterministics built from
    minibatch slices (reference transform/basic.py:66 removes the Minibatch
    ops wherever they appear)."""
    from ...graph import ancestors

    roots = []
    for orv in model.observed_RVs:
        if isinstance(orv.observed, Node):
            roots.append(orv.observed)
        roots.extend(p for p in orv.dist.param_values() if isinstance(p, Node))
    for rv in model.free_RVs:
        roots.extend(p for p in rv.dist.param_values() if isinstance(p, Node))
    roots.extend(model.deterministics)
    roots.extend(model.potentials)

    replace = {}
    for node in ancestors(roots):
        if getattr(node, "is_minibatch", False) and isinstance(
            node, DeterministicNode
        ):
            full = node.args[0]
            replace[node] = (
                full if isinstance(full, Node) else ConstantNode(full)
            )
    if not replace:
        return clone_model(model)
    new = model_map(model, replace=replace)
    from ...graph import DataNode

    for orv in new.observed_RVs:
        orv.scale = 1.0
        # the dist's shape metadata was frozen at the MINIBATCH size; point
        # it at the full data (live, so set_data predictions resize)
        orv.dist._shape_arg = tuple(orv.shape)
        if isinstance(orv.observed, DataNode):
            orv.dist._shape_node = orv.observed
        orv.dist._resolve_shapes()
    return new


def extract_deterministics(model, vars):
    """Turn Deterministics back into plain (untracked) expressions
    (reference transform/basic.py). Returns a clone where the named
    deterministics are no longer traced."""
    from .basic import model_map

    names = {getattr(v, "name", str(v)) for v in vars}
    new = model_map(model)
    new.deterministics[:] = [
        d for d in new.deterministics if d.name not in names
    ]
    for n in names:
        new.named_vars.pop(n, None)
    new._fn_cache.clear()
    return new


def insert_deterministics(model, named_exprs, dims=None):
    """Track expressions as Deterministics in a model clone
    (reference transform/basic.py)."""
    from ..core import Deterministic
    from .basic import model_map

    new = model_map(model)
    with new:
        for name, expr in named_exprs.items():
            Deterministic(name, expr)
    return new
