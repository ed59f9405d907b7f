"""Model conditioning transforms.

Parity: reference pymc/model/transform/conditioning.py (observe:46 —
condition free RVs on data; do:125 — graph intervention replacing RVs by
constants; change_value_transforms:233).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ...graph import ConstantNode, FreeRV, Node, ObservedRV
from .basic import _clone_dist, _clone_node, model_map

__all__ = ["do", "observe", "change_value_transforms"]


def _resolve_rv(model, var):
    if isinstance(var, str):
        return model.named_vars[var]
    return var


def do(model, vars_to_interventions, prune_vars=False):
    """Intervention operator (reference conditioning.py:125): replace RVs by
    fixed values; downstream structure keeps consuming the constant."""
    replace = {}
    names = []
    for var, value in vars_to_interventions.items():
        rv = _resolve_rv(model, var)
        const = ConstantNode(
            jnp.broadcast_to(jnp.asarray(value), rv.shape), name=rv.name
        )
        replace[rv] = const
        names.append(rv.name)
    new = model_map(model, replace=replace)
    # interventions appear as named data (reference keeps them accessible)
    for var, value in vars_to_interventions.items():
        rv = _resolve_rv(model, var)
        node = replace[rv]
        new.named_vars[rv.name] = node
        new.data_vars.append(node)
    if prune_vars:
        from .basic import prune_vars_detached_from_observed

        return prune_vars_detached_from_observed(new)
    return new


def observe(model, vars_to_observations):
    """Condition free RVs on observations (reference conditioning.py:46)."""
    replace = {}
    new_obs = []
    for var, value in vars_to_observations.items():
        rv = _resolve_rv(model, var)
        if not isinstance(rv, FreeRV):
            raise ValueError(f"Can only observe free RVs, got {rv}")
        arr = jnp.asarray(np.asarray(value))
        memo = {}
        dist = _clone_dist(rv.dist, memo, {})
        obs = ObservedRV(rv.name, dist, arr)
        obs.scale = 1.0
        replace[rv] = obs
        new_obs.append(obs)
    new = model_map(model, replace=replace)
    for obs in new_obs:
        obs.model = new
        new.observed_RVs.append(obs)
        new.named_vars[obs.name] = obs
    return new


def change_value_transforms(model, vars_to_transforms):
    """Swap value-space transforms (reference conditioning.py:233)."""
    new = model_map(model)
    for var, tr in vars_to_transforms.items():
        name = var if isinstance(var, str) else var.name
        rv = new.named_vars[name]
        if not isinstance(rv, FreeRV):
            raise ValueError(f"{name} is not a free RV")
        rv.transform = tr
    new._fn_cache.clear()
    return new


def remove_value_transforms(model, vars=None):
    """Replace value transforms with identity (sample in constrained space;
    reference conditioning.py:317)."""
    if vars is None:
        vars = [rv.name for rv in model.free_RVs]
    return change_value_transforms(model, {v: None for v in vars})
