"""Model compile-time optimization transforms.

Parity: reference pymc/model/transform/optimization.py
(freeze_dims_and_data:53, freeze_model:168 -> FrozenModel with memoized logp
graphs). Under XLA shapes are already static at trace time; freezing bakes
DataNode contents into constants so set_data can no longer retrigger
retraces (the reference's shared-variable -> constant conversion).
"""

from __future__ import annotations

from ...graph import ConstantNode, DataNode
from .basic import model_map

__all__ = ["freeze_dims_and_data", "freeze_model"]


def freeze_dims_and_data(model, dims=None, data=None):
    """Replace (all or selected) pm.Data containers by constants
    (reference optimization.py:53)."""
    replace = {}
    keep = None if data is None else set(data)
    for dv in model.data_vars:
        if not isinstance(dv, DataNode):
            continue
        if keep is not None and dv.name not in keep:
            continue
        c = ConstantNode(dv.get_value(), name=dv.name)
        replace[dv] = c
    new = model_map(model, replace=replace)
    for dv, c in replace.items():
        new.named_vars[dv.name] = c
    return new


def freeze_model(model):
    """Reference optimization.py:168 — frozen model with everything constant;
    jit caches then key purely on shapes."""
    return freeze_dims_and_data(model)
