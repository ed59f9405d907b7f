"""Value-space conversion helpers.

Parity: reference pymc/model/transform_values.py (constrain_values /
unconstrain_values) - thin wrappers over Model.constrain/unconstrain.
"""

from .core import modelcontext

__all__ = ["constrain_values", "unconstrain_values"]


def constrain_values(point, model=None):
    """Unconstrained value dict -> constrained parameter dict."""
    return modelcontext(model).constrain(point)


def unconstrain_values(point, model=None):
    """Constrained parameter dict -> unconstrained value dict."""
    return modelcontext(model).unconstrain(point)
