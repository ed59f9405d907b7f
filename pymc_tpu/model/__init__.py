from .core import (
    ConstantData,
    Data,
    MutableData,
    Deterministic,
    Model,
    Potential,
    compile,
    compile_fn,
    modelcontext,
    set_data,
)

__all__ = [
    "Data",
    "ConstantData",
    "MutableData",
    "Deterministic",
    "Model",
    "Potential",
    "compile",
    "compile_fn",
    "modelcontext",
    "set_data",
]
