from . import updates
from .approximations import Empirical, FullRank, MeanField
from .callbacks import CheckParametersConvergence, Tracker
from .inference import ADVI, ASVGD, SVGD, FullRankADVI, Inference, KLqp, fit

__all__ = [
    "ADVI",
    "ASVGD",
    "SVGD",
    "FullRankADVI",
    "Inference",
    "KLqp",
    "fit",
    "MeanField",
    "FullRank",
    "Empirical",
    "CheckParametersConvergence",
    "Tracker",
    "updates",
]
