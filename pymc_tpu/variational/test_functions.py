"""Test functions for operator VI.

Parity: reference pymc/variational/test_functions.py (rbf).
"""

from .operators import TestFunction, rbf

__all__ = ["TestFunction", "rbf"]
