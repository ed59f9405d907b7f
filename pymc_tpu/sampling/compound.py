"""Compound step dispatch for pm.sample (reference assign_step_methods).

The implementation lives in pymc_tpu/step_methods/compound.py; this module
keeps the import surface the mcmc driver expects.
"""

from ..step_methods.compound import sample_with_steps  # noqa: F401
