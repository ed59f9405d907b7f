"""Stein machinery (reference pymc/variational/stein.py)."""

from .operators import Stein, rbf

__all__ = ["Stein", "rbf"]
