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


def _group_indices(model, info, groups):
    """Resolve each Group's variable subset to flat-space index arrays.
    At most one Group(None) acts as the rest-group covering every latent not
    claimed by an explicit group (reference opvi.py:582 semantics)."""
    import numpy as np

    slices = info.slices()
    by_name = {rv.name: rv.value_name for rv in model.free_RVs}
    claimed = set()
    resolved = []
    rest_pos = None
    for g in groups:
        if g.group is None:
            if rest_pos is not None:
                raise ValueError("only one Group(None) rest-group is allowed")
            rest_pos = len(resolved)
            resolved.append(None)
            continue
        idx = []
        for v in g.group:
            name = getattr(v, "name", str(v))
            if name not in by_name:
                raise ValueError(
                    f"{name!r} is not a free variable of the model "
                    f"(free: {sorted(by_name)})"
                )
            if name in claimed:
                raise ValueError(f"{name!r} appears in more than one group")
            claimed.add(name)
            sl = slices[by_name[name]]
            idx.append(np.arange(sl.start, sl.stop))
        resolved.append(np.concatenate(idx) if idx else np.zeros(0, int))
    if rest_pos is not None:
        rest = [
            np.arange(slices[vn].start, slices[vn].stop)
            for n, vn in by_name.items() if n not in claimed
        ]
        resolved[rest_pos] = (
            np.concatenate(rest) if rest else np.zeros(0, int)
        )
    return resolved


def Approximation(groups, model=None):
    """Build the approximation selected by `groups` (reference opvi.py:1237).

    One group over all variables maps onto the corresponding vectorized
    family; multiple groups (each a named var subset with its own family,
    plus at most one Group(None) rest-group) compose into a Blocked
    approximation whose single ELBO program optimizes all families jointly.
    """
    model = modelcontext(model)
    groups = list(groups)
    info = model.raveled_info()
    D = info.total_size

    if len(groups) == 1 and groups[0].group is None:
        g = groups[0]
        cls = _FAMILIES[g.vfam]
        if cls is Empirical:
            raise NotImplementedError(
                "Empirical groups: build pm.Empirical from draws directly"
            )
        params = cls.init_params(D, **g.kwargs)
        return cls(model, info, params)

    from .approximations import Blocked

    families = []
    for g in groups:
        cls = _FAMILIES[g.vfam]
        if cls is Empirical:
            raise NotImplementedError(
                "Empirical members of a heterogeneous Approximation are not "
                "supported (no density for the ELBO); use SVGD directly"
            )
        families.append(cls)
    indices = _group_indices(model, info, groups)
    blocked_cls = Blocked.make(families, indices, D)
    params = blocked_cls.init_params(
        D, group_kwargs=[g.kwargs for g in groups]
    )
    return blocked_cls(model, info, params)


def sample_approx(approx, draws=100, include_transformed=True,
                  random_seed=None):
    """Draw samples from a fitted approximation
    (reference approximations.py:sample_approx)."""
    if not hasattr(approx, "sample"):
        raise TypeError(f"{type(approx).__name__} is not an Approximation")
    return approx.sample(draws=draws, random_seed=random_seed)
