"""Distributions subpackage (reference pymc/distributions/__init__.py)."""

from . import moments, shape_utils
from .distribution import SymbolicRandomVariable  # noqa: F401
from .distribution import Continuous, Discrete, DiracDelta, Distribution, UNSET
from .continuous import *  # noqa: F401,F403
from .discrete import *  # noqa: F401,F403
from .multivariate import *  # noqa: F401,F403
from .mixture import *  # noqa: F401,F403
from .censored import Censored
from .derived import Discretized, OrderStatistic, Max, Min, CumSum, Compared
from .truncated import Truncated
from .timeseries import *  # noqa: F401,F403
from .custom import CustomDist, DensityDist
from .simulator import Simulator
from . import transforms
from .continuous import __all__ as _cont_all
from .discrete import __all__ as _disc_all
from .multivariate import __all__ as _mv_all
from .mixture import __all__ as _mix_all
from .timeseries import __all__ as _ts_all

__all__ = [
    "SymbolicRandomVariable", "shape_utils", "moments",
    "Continuous",
    "Discrete",
    "DiracDelta",
    "Distribution",
    "UNSET",
    "transforms",
    *_cont_all,
    *_disc_all,
    *_mv_all,
    *_mix_all,
    *_ts_all,
    "Censored",
    "Discretized",
    "OrderStatistic",
    "Max",
    "Min",
    "CumSum",
    "Compared",
    "Truncated",
    "CustomDist",
    "DensityDist",
    "Simulator",
]
