"""Distributions subpackage (reference pymc/distributions/__init__.py)."""

from .distribution import Continuous, Discrete, DiracDelta, Distribution, UNSET
from .continuous import *  # noqa: F401,F403
from .discrete import *  # noqa: F401,F403
from .multivariate import *  # noqa: F401,F403
from . import transforms
from .continuous import __all__ as _cont_all
from .discrete import __all__ as _disc_all
from .multivariate import __all__ as _mv_all

__all__ = [
    "Continuous",
    "Discrete",
    "DiracDelta",
    "Distribution",
    "UNSET",
    "transforms",
    *_cont_all,
    *_disc_all,
    *_mv_all,
]
