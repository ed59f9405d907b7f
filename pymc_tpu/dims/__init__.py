"""Dims-first model API with named-dimension broadcasting semantics.

Parity: reference pymc/dims/ (experimental xarray-backed API over PyTensor
XTensorVariables: DimDistribution core at dims/distributions/core.py:189,
dims-or-param-inferred output dims, name-aligned broadcasting, Data/
Deterministic wrappers at dims/model.py:31-90).

TPU-native redesign: instead of a labeled tensor type threaded through the
compiler, named dims live in a thin `DimVar` proxy over the static graph
Node. Alignment happens at GRAPH BUILD time — `DimVar` operands are
transposed/expanded by dim name into a shared layout, then ordinary
positional Node ops (which fuse into the single XLA logp program) do the
compute. Runtime cost: zero; XLA sees plain broadcasts.

Semantics implemented (mirroring xarray):
- distribution constructors align parameters by dim NAME into the declared
  `dims` (order included), e.g. ``pm.dims.Normal("y", mu=x_a, dims=("b","a"))``
- ``dims=None`` infers output dims from the union of parameter dims in
  order of first appearance (reference DimDistribution behavior)
- arithmetic between DimVars broadcasts by name: ``x[a] * w[b] -> (a, b)``
- reductions take ``dim=`` names: ``z.sum(dim="a")``
- ``.transpose(*names)``, ``.rename(**mapping)``, ``.dot(other, dim=...)``
"""

from __future__ import annotations

import functools

import numpy as np

import pymc_tpu as _pm
from ..graph import Node, as_node, is_node
from ..model.core import Data as _Data
from ..model.core import Deterministic as _Deterministic
from ..model.core import Potential as _Potential
from ..model.core import modelcontext

__all__ = [
    "math", "transforms",
    "DimVar", "align", "with_dims",
    "Data", "Deterministic", "Potential",
    # populated dynamically below with dims-first distribution wrappers
]


def _dims_of(x):
    """Known dims of a value: DimVar -> its dims; a registered model Node
    (RV/Deterministic/Data) -> its .dims metadata; otherwise None."""
    if isinstance(x, DimVar):
        return tuple(x.dims)
    if is_node(x):
        d = getattr(x, "dims", None)
        if d is not None and all(isinstance(n, str) for n in d):
            return tuple(d)
    return None


def _node_of(x):
    return x.node if isinstance(x, DimVar) else x


def _align_node(node, d, out_dims):
    """Transpose/expand a Node with dims `d` into the layout `out_dims`
    (singleton axes inserted for missing names)."""
    unknown = [n for n in d if n not in out_dims]
    if unknown:
        raise ValueError(
            f"dimension(s) {unknown} of a parameter are not in the target "
            f"dims {tuple(out_dims)}"
        )
    node = as_node(node)
    order = sorted(range(len(d)), key=lambda i: out_dims.index(d[i]))
    if order != list(range(len(d))):
        node = node.transpose(*order)
    kept = [d[i] for i in order]
    shape = []
    k = 0
    node_shape = tuple(node.shape)
    for n in out_dims:
        if n in kept:
            shape.append(node_shape[k])
            k += 1
        else:
            shape.append(1)
    if len(shape) != len(kept):
        node = node.reshape(*shape)
    return node


def align(x, dims):
    """Align a dim-carrying value into the layout `dims` (public helper).
    Values with unknown dims pass through (positional trailing broadcast)."""
    dims = (dims,) if isinstance(dims, str) else tuple(dims)
    d = _dims_of(x)
    if d is None:
        return _node_of(x)
    return _align_node(_node_of(x), d, dims)


def with_dims(node, dims):
    """Wrap an existing graph Node / array with named dims."""
    dims = (dims,) if isinstance(dims, str) else tuple(dims)
    return DimVar(as_node(node), dims)


class DimVar:
    """A graph Node labeled with named dims; operations broadcast by NAME
    (the reference's XTensorVariable role, dims/distributions/core.py:189).

    This is a build-time proxy: every operation aligns operands into a shared
    named layout and emits plain positional Node ops, so the compiled XLA
    program is identical to hand-written broadcasting.
    """

    __array_priority__ = 100  # win binops against numpy arrays

    def __init__(self, node, dims):
        node = as_node(node)
        dims = (dims,) if isinstance(dims, str) else tuple(dims)
        if len(dims) != len(node.shape):
            raise ValueError(
                f"dims {dims} do not match value ndim {len(node.shape)} "
                f"(shape {tuple(node.shape)})"
            )
        if len(set(dims)) != len(dims):
            raise ValueError(f"duplicate dims in {dims}")
        self.node = node
        self.dims = dims

    # ------------------------------------------------------------- meta
    @property
    def shape(self):
        return tuple(self.node.shape)

    @property
    def ndim(self):
        return len(self.dims)

    @property
    def name(self):
        return getattr(self.node, "name", None)

    def sizes(self):
        return dict(zip(self.dims, self.shape))

    def __repr__(self):
        return f"<DimVar {self.name or ''} dims={self.dims} shape={self.shape}>"

    def eval(self, env=None, point=None):
        return self.node.eval(env=env, point=point)

    # ------------------------------------------------------- broadcasting
    def _union_dims(self, other):
        d_other = _dims_of(other)
        if d_other is None:
            # dimension-less operand: must be scalar-broadcastable
            nd = np.ndim(other) if not is_node(other) else len(other.shape)
            if nd != 0:
                raise ValueError(
                    "cannot mix a positional (unnamed) non-scalar array into "
                    "named-dim arithmetic; wrap it with pm.dims.with_dims"
                )
            return self.dims
        return self.dims + tuple(n for n in d_other if n not in self.dims)

    def _binop(self, other, op, reflected=False):
        out_dims = self._union_dims(other)
        a = _align_node(self.node, self.dims, out_dims)
        d_other = _dims_of(other)
        if d_other is None:
            b = _node_of(other)
        else:
            b = _align_node(_node_of(other), d_other, out_dims)
        res = op(b, a) if reflected else op(a, b)
        return DimVar(res, out_dims)

    def __add__(self, o):
        return self._binop(o, lambda a, b: a + b)

    def __radd__(self, o):
        return self._binop(o, lambda a, b: a + b, reflected=True)

    def __sub__(self, o):
        return self._binop(o, lambda a, b: a - b)

    def __rsub__(self, o):
        return self._binop(o, lambda a, b: a - b, reflected=True)

    def __mul__(self, o):
        return self._binop(o, lambda a, b: a * b)

    def __rmul__(self, o):
        return self._binop(o, lambda a, b: a * b, reflected=True)

    def __truediv__(self, o):
        return self._binop(o, lambda a, b: a / b)

    def __rtruediv__(self, o):
        return self._binop(o, lambda a, b: a / b, reflected=True)

    def __pow__(self, o):
        return self._binop(o, lambda a, b: a**b)

    def __rpow__(self, o):
        return self._binop(o, lambda a, b: a**b, reflected=True)

    def __neg__(self):
        return DimVar(-self.node, self.dims)

    # ------------------------------------------------------- reductions
    def _reduce(self, method, dim=None, **kwargs):
        if dim is None:
            return getattr(self.node, method)(axis=None, **kwargs)
        names = (dim,) if isinstance(dim, str) else tuple(dim)
        axes = tuple(self.dims.index(n) for n in names)
        out = getattr(self.node, method)(axis=axes, **kwargs)
        rest = tuple(n for n in self.dims if n not in names)
        return DimVar(out, rest) if rest else out

    def sum(self, dim=None):
        return self._reduce("sum", dim)

    def mean(self, dim=None):
        return self._reduce("mean", dim)

    def std(self, dim=None):
        return self._reduce("std", dim)

    def var(self, dim=None):
        return self._reduce("var", dim)

    def max(self, dim=None):
        return self._reduce("max", dim)

    def min(self, dim=None):
        return self._reduce("min", dim)

    def prod(self, dim=None):
        return self._reduce("prod", dim)

    # ----------------------------------------------------- shape algebra
    def transpose(self, *names):
        if not names:
            names = tuple(reversed(self.dims))
        order = tuple(self.dims.index(n) for n in names)
        return DimVar(self.node.transpose(*order), tuple(names))

    @property
    def T(self):
        return self.transpose()

    def rename(self, **mapping):
        return DimVar(
            self.node, tuple(mapping.get(n, n) for n in self.dims)
        )

    def isel(self, **indexers):
        """Positional selection by dim name: x.isel(a=3) drops dim 'a'."""
        node = self.node
        dims = list(self.dims)
        # apply from the highest axis down so earlier indexes stay valid
        for n in sorted(indexers, key=dims.index, reverse=True):
            ax = dims.index(n)
            idx = tuple(
                indexers[n] if i == ax else slice(None) for i in range(len(dims))
            )
            node = node[idx]
            if isinstance(indexers[n], int):
                dims.pop(ax)
        return DimVar(node, tuple(dims)) if dims else node

    def dot(self, other, dim):
        """Named contraction: sum over `dim` of self * other (xtensor dot)."""
        prod = self * other
        return prod.sum(dim=dim)


# ---------------------------------------------------------------- builders
_CONTROL_KWS = {
    "observed", "dims", "transform", "default_transform", "initval",
    "total_size", "shape", "size",
}


def _resolve_dim_transforms(kwargs, out_dims):
    """Resolve dim-NAMED transform objects (dims/transforms.py DimTransform)
    against the RV's declared dims into positional transforms, in place."""
    from .transforms import DimTransform

    for k in ("transform", "default_transform"):
        t = kwargs.get(k)
        if isinstance(t, DimTransform):
            kwargs[k] = t.resolve(tuple(out_dims or ()))


def _infer_dims(args, kwargs):
    """Union of parameter dims in order of first appearance (reference
    DimDistribution: dims inferred from params when not given)."""
    out = []
    for v in list(args) + [v for k, v in kwargs.items() if k not in _CONTROL_KWS]:
        d = _dims_of(v)
        if d:
            for n in d:
                if n not in out:
                    out.append(n)
    return tuple(out)


def _expand_ellipsis(declared, inferred):
    """Expand ``...`` in a dims spec to every inferred dim not named
    explicitly, in inferred order (reference
    pymc/distributions/shape_utils.py:convert_dims_with_ellipsis +
    pymc/dims/distributions/core.py transpose-with-ellipsis semantics)."""
    if declared is Ellipsis:
        declared = (Ellipsis,)
    declared = (declared,) if isinstance(declared, str) else tuple(declared)
    if Ellipsis not in declared:
        return declared
    if declared.count(Ellipsis) > 1:
        raise ValueError("dims may contain at most one Ellipsis")
    explicit = [d for d in declared if d is not Ellipsis]
    rest = [d for d in inferred if d not in explicit]
    i = declared.index(Ellipsis)
    return tuple(list(declared[:i]) + rest + list(declared[i + 1:]))


def _dims_first(dist_cls):
    event_ndim = getattr(dist_cls, "event_ndim", 0)

    @functools.wraps(dist_cls.__new__, assigned=("__doc__",))
    def ctor(name, *args, dims=None, **kwargs):
        modelcontext(None)  # require a model context
        inferred = _infer_dims(args, kwargs)
        obs_dims = _dims_of(kwargs.get("observed"))
        if obs_dims:
            inferred = inferred + tuple(
                d for d in obs_dims if d not in inferred
            )
        if dims is None:
            dims = inferred
            if not dims and kwargs.get("observed") is None:
                raise TypeError(
                    f"pm.dims.{dist_cls.__name__} requires dims= (or "
                    "parameters that carry named dims); use pm."
                    f"{dist_cls.__name__} for shape-based construction"
                )
        dims_t = _expand_ellipsis(dims, inferred)
        if event_ndim == 0 and dims_t:
            # align every named-dim parameter into the declared layout
            args = tuple(align(a, dims_t) if _dims_of(a) is not None else a
                         for a in args)
            kwargs = {
                k: (align(v, dims_t)
                    if k not in _CONTROL_KWS and _dims_of(v) is not None
                    else v)
                for k, v in kwargs.items()
            }
        else:
            # multivariate: core (event) dims are positional; batch-dim
            # alignment passes through unchanged (document in PARITY.md)
            args = tuple(_node_of(a) for a in args)
            kwargs = {
                k: (_node_of(v) if k not in _CONTROL_KWS else v)
                for k, v in kwargs.items()
            }
        obs = kwargs.get("observed")
        if isinstance(obs, DimVar):
            # align named observed data (e.g. pm.dims.Data) into the declared
            # layout and unwrap to the underlying node (reference
            # dims/distributions/core.py: observed xtensor dims propagate)
            kwargs["observed"] = align(obs, dims_t) if dims_t else obs.node
        _resolve_dim_transforms(kwargs, dims_t)
        rv = dist_cls(name, *args, dims=dims_t or None, **kwargs)
        out_dims = dims_t or tuple(getattr(rv, "dims", ()) or ())
        if out_dims and len(out_dims) == len(getattr(rv, "shape", ())):
            return DimVar(rv, out_dims)
        return rv

    ctor.__name__ = dist_cls.__name__
    ctor.dist = dist_cls.dist
    return ctor


# ------------------------------------------------- multivariate core dims
# Parity: reference pymc/dims/distributions/vector.py — vector distributions
# take `core_dims=` naming their event dimension(s); parameters are aligned
# by NAME (each parameter declares which core dims it carries), batch dims
# are the union of the parameters' non-core dims, and the output carries
# batch dims + the distribution's output core dims.
#
# Per-parameter core-dim indices into the declared `core_dims` tuple:
#   MvNormal   (vector.py:121): mu -> core_dims[0]; cov/chol/tau -> both.
#              Output keeps core_dims[0] (the dim shared with mu).
#   Dirichlet  (vector.py:66):  a -> core_dims[0]; output keeps it
#              (simplex transform over that dim).
#   Multinomial: n scalar-per-batch; p -> core_dims[0]; output keeps it.
#   Categorical (vector.py:27): p/logit_p -> core_dims[0]; the output DROPS
#              the core dim (categories are absorbed).
#   ZeroSumNormal (vector.py:179): sigma has no core dims; output carries
#              every core dim, with the zero-sum transform over them.
_VECTOR_SPECS = {
    "MvNormal": {
        "params": {"mu": (0,), "cov": (0, 1), "chol": (0, 1), "tau": (0, 1)},
        "arg_order": ("mu", "cov"), "n_core": 2, "out_core": (0,),
    },
    "MvStudentT": {
        "params": {"nu": (), "mu": (0,), "cov": (0, 1), "chol": (0, 1),
                   "scale": (0, 1)},
        "arg_order": ("nu", "mu", "cov"), "n_core": 2, "out_core": (0,),
    },
    "Dirichlet": {
        "params": {"a": (0,)},
        "arg_order": ("a",), "n_core": 1, "out_core": (0,),
    },
    "Multinomial": {
        "params": {"n": (), "p": (0,)},
        "arg_order": ("n", "p"), "n_core": 1, "out_core": (0,),
    },
    "DirichletMultinomial": {
        "params": {"n": (), "a": (0,)},
        "arg_order": ("n", "a"), "n_core": 1, "out_core": (0,),
    },
    "Categorical": {
        "params": {"p": (0,), "logit_p": (0,)},
        "arg_order": ("p",), "n_core": 1, "out_core": (),
    },
    "ZeroSumNormal": {
        "params": {"sigma": ()},
        "arg_order": ("sigma",), "n_core": None, "out_core": "all",
    },
}


def _vector_dims_first(dist_cls, spec):
    def ctor(name, *args, core_dims=None, dims=None, **kwargs):
        model = modelcontext(None)
        if core_dims is None:
            raise TypeError(
                f"pm.dims.{dist_cls.__name__} requires core_dims= naming the "
                "event dimension(s)"
            )
        core = (core_dims,) if isinstance(core_dims, str) else tuple(core_dims)
        n_core = spec["n_core"]
        if n_core is not None and len(core) != n_core:
            raise ValueError(
                f"{dist_cls.__name__} requires {n_core} core_dims, got {core}"
            )
        if len(set(core)) != len(core):
            raise ValueError(f"duplicate core_dims {core}")
        for pname, v in zip(spec["arg_order"], args):
            if pname in kwargs:
                raise TypeError(f"duplicate parameter {pname!r}")
            kwargs[pname] = v
        out_core = (
            core if spec["out_core"] == "all"
            else tuple(core[i] for i in spec["out_core"])
        )
        # batch dims: union of parameters' non-core dims, first appearance
        batch = []
        for pname, idxs in spec["params"].items():
            v = kwargs.get(pname)
            d = _dims_of(v) if v is not None else None
            if d:
                own_core = {core[i] for i in idxs}
                for nm in d:
                    if nm in own_core:
                        continue
                    if nm in core:
                        raise ValueError(
                            f"parameter {pname!r} carries core dim {nm!r} "
                            f"it does not use (its core dims are "
                            f"{tuple(sorted(own_core))})"
                        )
                    if nm not in batch:
                        batch.append(nm)
        if dims is not None:
            declared = _expand_ellipsis(dims, tuple(batch) + out_core)
            k = len(declared) - len(out_core)
            if k < 0 or tuple(declared[k:]) != out_core:
                raise ValueError(
                    f"dims {declared} must end with the output core dims "
                    f"{out_core}"
                )
            declared_batch = list(declared[:k])
            missing = [b for b in batch if b not in declared_batch]
            if missing:
                raise ValueError(
                    f"dims {declared} is missing parameter batch dims "
                    f"{missing}"
                )
            batch = declared_batch
        out_dims = tuple(batch) + out_core

        aligned = {}
        for k2, v in kwargs.items():
            if k2 in spec["params"] and v is not None:
                idxs = spec["params"][k2]
                target = tuple(batch) + tuple(core[i] for i in idxs)
                d = _dims_of(v)
                if d is not None:
                    aligned[k2] = _align_node(_node_of(v), d, target)
                else:
                    nd = np.ndim(v) if not is_node(v) else len(v.shape)
                    if nd > len(idxs):
                        raise ValueError(
                            f"positional (unnamed) parameter {k2!r} has ndim "
                            f"{nd} > its core ndim {len(idxs)}; wrap it with "
                            "pm.dims.with_dims to name its batch dims"
                        )
                    aligned[k2] = _node_of(v)
            else:
                aligned[k2] = v  # control kwargs (observed, initval, ...)

        # shape: coords when declared, else inferred from aligned parameters
        # (register_rv then records any new dims from the dist shape)
        if aligned.get("observed") is None and "shape" not in aligned:
            known = model.dim_lengths
            lengths = []
            for pos, dname in enumerate(out_dims):
                if dname in known:
                    lengths.append(known[dname])
                    continue
                ln = None
                for pname, idxs in spec["params"].items():
                    v = aligned.get(pname)
                    if v is None:
                        continue
                    target = tuple(batch) + tuple(core[i] for i in idxs)
                    if dname not in target:
                        continue
                    vshape = tuple(as_node(v).shape)
                    # aligned params are right-aligned against the target
                    offset = len(target) - len(vshape)
                    j = target.index(dname) - offset
                    if 0 <= j < len(vshape) and int(vshape[j]) != 1:
                        ln = int(vshape[j])
                        break
                if ln is None:
                    raise KeyError(
                        f"cannot infer length of dim {dname!r}: declare it "
                        "via model coords or pass a parameter carrying it"
                    )
                lengths.append(ln)
            aligned["shape"] = tuple(lengths)

        if dist_cls.__name__ == "ZeroSumNormal":
            aligned["n_zerosum_axes"] = len(core)
        _resolve_dim_transforms(aligned, out_dims)
        rv = dist_cls(name, dims=out_dims or None, **aligned)
        if out_dims and len(out_dims) == len(getattr(rv, "shape", ())):
            return DimVar(rv, out_dims)
        return rv

    ctor.__name__ = dist_cls.__name__
    ctor.__qualname__ = f"dims.{dist_cls.__name__}"
    ctor.__doc__ = (
        f"dims-first {dist_cls.__name__} with named core (event) dims "
        "(reference pymc/dims/distributions/vector.py semantics). "
        f"Parameter core-dim roles: {spec['params']}."
    )
    return ctor


_DIST_NAMES = [
    "Normal", "HalfNormal", "LogNormal", "StudentT", "HalfStudentT",
    "Cauchy", "HalfCauchy", "Beta", "Gamma", "InverseGamma", "Exponential",
    "Laplace", "Uniform", "Logistic", "Gumbel", "Weibull", "Flat", "HalfFlat",
    "TruncatedNormal", "DiracDelta",
    "Bernoulli", "Binomial", "Poisson", "NegativeBinomial",
    "Geometric", "DiscreteUniform", "Mixture", "Censored", "Truncated",
]

for _n in _DIST_NAMES:
    if hasattr(_pm, _n):
        globals()[_n] = _dims_first(getattr(_pm, _n))
        __all__.append(_n)

for _n, _spec in _VECTOR_SPECS.items():
    if hasattr(_pm, _n):
        globals()[_n] = _vector_dims_first(getattr(_pm, _n), _spec)
        __all__.append(_n)


def Data(name, value, *, dims=None, **kwargs):
    if dims is None:
        raise TypeError("pm.dims.Data requires dims=")
    node = _Data(name, value, dims=dims, **kwargs)
    dims_t = (dims,) if isinstance(dims, str) else tuple(dims)
    if len(dims_t) == len(getattr(node, "shape", ())):
        return DimVar(node, dims_t)
    return node


def Deterministic(name, var, *, dims=None, **kwargs):
    if isinstance(var, DimVar):
        if dims is None:
            dims = var.dims
        else:
            dims_t = (dims,) if isinstance(dims, str) else tuple(dims)
            var = var.transpose(*dims_t)
        node = _Deterministic(name, var.node, dims=var.dims, **kwargs)
        return DimVar(node, var.dims)
    if dims is None:
        raise TypeError(
            "pm.dims.Deterministic requires dims= (or a DimVar value)"
        )
    return _Deterministic(name, var, dims=dims, **kwargs)


def Potential(name, var, **kwargs):
    return _Potential(name, _node_of(var), **kwargs)


from . import math  # noqa: E402  (math aliases the Node-aware namespace)
from . import transforms  # noqa: E402  (dim-named transform objects)
