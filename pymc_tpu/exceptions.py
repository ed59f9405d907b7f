"""Exception types.

Parity: /root/reference/pymc/exceptions.py (SamplingError, IncorrectArgumentsError,
TruncationError, ImputationWarning, ShapeError, DtypeError, BlockModelAccessError).
"""

__all__ = [
    "SamplingError",
    "IncorrectArgumentsError",
    "TruncationError",
    "ImputationWarning",
    "ShapeError",
    "ShapeWarning",
    "DtypeError",
    "ParameterValueError",
    "BlockModelAccessError",
    "ImplicitFreezeWarning",
    "NotConstantValueError",
    "TraceDirectoryError",
    "UndefinedMomentException",
]


class SamplingError(RuntimeError):
    """Raised when sampling cannot proceed (e.g. non-finite initial logp)."""


class IncorrectArgumentsError(ValueError):
    pass


class TruncationError(RuntimeError):
    """Raised when rejection sampling of a truncated variable fails."""


class ImputationWarning(UserWarning):
    """Warning emitted when automatically imputing missing observed values."""


class ShapeWarning(UserWarning):
    pass


class ShapeError(Exception):
    """Error that the shape of a variable is incorrect."""

    def __init__(self, message, actual=None, expected=None):
        if actual is not None and expected is not None:
            super().__init__(f"{message} (actual {actual} != expected {expected})")
        elif actual is not None:
            super().__init__(f"{message} (actual {actual})")
        elif expected is not None:
            super().__init__(f"{message} (expected {expected})")
        else:
            super().__init__(message)


class DtypeError(TypeError):
    """Error that the dtype of a variable is incorrect."""

    def __init__(self, message, actual=None, expected=None):
        if actual is not None and expected is not None:
            super().__init__(f"{message} (actual {actual} != expected {expected})")
        else:
            super().__init__(message)


class ParameterValueError(ValueError):
    """Raised when a distribution parameter is outside its support.

    Under jit the equivalent runtime behavior is a ``-inf`` logp (XLA cannot
    raise); this exception is raised eagerly where detectable.
    """


class BlockModelAccessError(RuntimeError):
    pass


class NotConstantValueError(ValueError):
    """Raised when a graph value expected to be constant is symbolic
    (reference exceptions.py)."""


class TraceDirectoryError(ValueError):
    """Trace directory exists but lacks the expected layout
    (reference exceptions.py; raised by FileTrace misuse)."""


class UndefinedMomentException(Exception):
    """No support point / moment exists for a distribution
    (reference exceptions.py)."""


class ImplicitFreezeWarning(UserWarning):
    """Dims/data were implicitly frozen by a transformation
    (reference exceptions.py)."""
