from .core import (
    Data,
    Deterministic,
    Model,
    Potential,
    compile_fn,
    modelcontext,
    set_data,
)

__all__ = [
    "Data",
    "Deterministic",
    "Model",
    "Potential",
    "compile_fn",
    "modelcontext",
    "set_data",
]
