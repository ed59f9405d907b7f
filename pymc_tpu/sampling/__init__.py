from .mcmc import init_nuts, sample

__all__ = ["sample", "init_nuts"]
