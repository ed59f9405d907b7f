"""Compound / non-NUTS step methods driver (reference
pymc/step_methods/compound.py + assign_step_methods mcmc.py:256).

Implemented in a later milestone this round; this placeholder gives a clear
error meanwhile.
"""

from __future__ import annotations


def sample_with_steps(**kwargs):
    raise NotImplementedError(
        "Compound/discrete step methods are not wired into pm.sample yet; "
        "coming in the Metropolis/Slice milestone."
    )
