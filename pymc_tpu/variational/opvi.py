"""OPVI surface compatibility: Group + sample_approx.

Parity: reference pymc/variational/opvi.py — `Group` (:582, a named set of
latent variables with its own approximating family) and the functional
`sample_approx` (approximations.py:sample_approx). SURVEY §2.10's TPU
mapping simplifies the Operator/TestFunction algebra to
(guide family × divergence); `Group` here is the user-facing entry to that:
one group covering the model's latent space selects the family, and
`Approximation(groups)` instantiates it. Heterogeneous per-subset families
(rarely used) raise with a clear message.
"""

from __future__ import annotations

from ..model.core import modelcontext
from .approximations import Empirical, FullRank, MeanField
from .operators import KL, KSD, ObjectiveFunction, Operator, TestFunction

__all__ = ["Group", "Approximation", "sample_approx",
           "Operator", "ObjectiveFunction", "TestFunction", "KL", "KSD"]

_FAMILIES = {
    "mean_field": MeanField, "mf": MeanField,
    "full_rank": FullRank, "fr": FullRank,
    "hist": Empirical, "histogram": Empirical, "empirical": Empirical,
}


class Group:
    """A set of latent variables approximated by one family
    (reference opvi.py:582). `group=None` means "all free variables"."""

    def __init__(self, group=None, vfam="mean_field", params=None,
                 model=None, **kwargs):
        self.group = group
        self.vfam = str(vfam).lower().replace("-", "_")
        if self.vfam not in _FAMILIES:
            raise ValueError(
                f"Unknown vfam {vfam!r}; choose from {sorted(_FAMILIES)}"
            )
        self.params = params
        self.kwargs = kwargs
        self._model = model

    def __class_getitem__(cls, item):
        return cls

    def __repr__(self):
        names = (
            "all free RVs" if self.group is None
            else [getattr(v, "name", v) for v in self.group]
        )
        return f"Group({names}, vfam={self.vfam!r})"


def Approximation(groups, model=None):
    """Build the approximation selected by `groups`
    (reference opvi.py:1237). One group (possibly over all variables)
    maps onto the corresponding vectorized family over the model's
    unconstrained space."""
    model = modelcontext(model)
    groups = list(groups)
    if len(groups) != 1:
        raise NotImplementedError(
            "pymc_tpu supports a single approximating family over the "
            "model's latent space (SURVEY §2.10 TPU mapping); compose "
            "heterogeneous structure inside the model instead"
        )
    g = groups[0]
    if g.group is not None:
        free = {rv.name for rv in model.free_RVs}
        asked = {getattr(v, "name", str(v)) for v in g.group}
        if asked != free:
            raise NotImplementedError(
                f"per-subset groups are not supported (asked {sorted(asked)}, "
                f"model has {sorted(free)}); use group=None for all variables"
            )
    cls = _FAMILIES[g.vfam]
    if cls is Empirical:
        raise NotImplementedError(
            "Empirical groups: build pm.Empirical from draws directly"
        )
    info = model.raveled_info()
    params = cls.init_params(info.total_size, **g.kwargs)
    return cls(model, info, params)


def sample_approx(approx, draws=100, include_transformed=True,
                  random_seed=None):
    """Draw samples from a fitted approximation
    (reference approximations.py:sample_approx)."""
    if not hasattr(approx, "sample"):
        raise TypeError(f"{type(approx).__name__} is not an Approximation")
    return approx.sample(draws=draws, random_seed=random_seed)
