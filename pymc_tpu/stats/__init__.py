from .convergence import ess, mcse_mean, mcse_sd, rhat, run_convergence_checks

__all__ = ["ess", "rhat", "mcse_mean", "mcse_sd", "run_convergence_checks"]
