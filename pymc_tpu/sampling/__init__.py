from .forward import (
    compute_deterministics,
    sample_posterior_predictive,
    sample_prior_predictive,
    vectorize_over_posterior,
)
from .mcmc import init_nuts, sample

__all__ = [
    "sample",
    "init_nuts",
    "sample_prior_predictive",
    "sample_posterior_predictive",
    "compute_deterministics",
    "vectorize_over_posterior",
]
