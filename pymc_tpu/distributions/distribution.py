"""Distribution base classes — the JAX-native replacement for the reference's
RandomVariable-Op + graph-rewrite machinery.

Parity: pymc/distributions/distribution.py (Distribution.__new__:465 named-RV
path, Distribution.dist:597 unnamed path, support_point dispatch:679,
DistributionMeta logp/logcdf/icdf registration:87-198). Here distributions are
plain objects with pure-JAX methods:

    logp(value, env)         elementwise log-density over the batch shape
    logcdf / logccdf / icdf
    sample(key, sample_shape, env)
    support_point(env)       initial-value heuristic
    default_transform()      unconstraining bijector for the sampler

Parameters may be concrete arrays OR symbolic graph Nodes (outputs of other
RVs/deterministics); they are resolved through the evaluation env at trace
time, so a model's joint logp remains one fused XLA program.

Shapes are fully static (XLA requirement): batch shape is resolved at
construction from parameter shapes / `shape=` / `size=` / `dims=` / observed.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import floatX, intX
from ..exceptions import ShapeError
from ..graph import Node, evaluate, is_node
from . import transforms as tr

__all__ = [
    "Distribution",
    "Continuous",
    "Discrete",
    "UNSET",
    "DiracDelta",
]


class _Unset:
    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self):
        return "UNSET"

    def __bool__(self):
        return False


UNSET = _Unset()


def _as_param(x, float_ok=True):
    """Normalize a distribution parameter: Nodes pass through; concrete values
    become jnp arrays in the default float dtype (unless integral semantics)."""
    if x is None or isinstance(x, Node):
        return x
    x = jnp.asarray(x)
    if float_ok and not jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(floatX())
    return x


def _shape_of(p):
    if p is None:
        return ()
    if isinstance(p, Node):
        return tuple(p.shape)
    return tuple(np.shape(p))


_ANON_RV_COUNTER = 0


class Distribution:
    """Base class. Subclasses define:

    param_names : tuple of parameter attribute names (resolution order)
    param_event_ndims : per-param event ndim (default zeros) for batch-shape
        inference of multivariate distributions
    event_ndim : int, ndim of a single event (0 scalar, 1 vector, 2 matrix)
    support : str in {"real","positive","unit_interval","interval","simplex",
        "circular","ordered",...} controlling the default transform
    is_discrete : bool

    __dist_init__(self, ...)   canonicalize & store params
    _logp(self, value, *params)
    _logcdf(self, value, *params)         (optional)
    _icdf(self, q, *params)               (optional)
    _sample(self, key, shape, *params)    shape = FULL result shape
    _support_point(self, *params)         (broadcast to full shape by base)
    _event_shape(self, *param_shapes)     (optional, default ())
    """

    param_names: tuple = ()
    # optional auxiliary parametrization nodes (e.g. the logit of a
    # sigmoid-headed `p`) passed to _logp/_logcdf as keyword args when set —
    # the role of the reference's sigmoid-introduction logp rewrites
    # (logprob/rewriting.py pipeline pos 0.9): numerically stable densities
    # when a probability parameter underflows but its logit is finite
    aux_param_names: tuple = ()
    param_event_ndims: tuple | None = None
    event_ndim: int = 0
    support: str = "real"
    is_discrete: bool = False
    # graph.apply lifts Distribution operands to anonymous RV nodes (the
    # reference's ``.dist()`` variables participate in expressions directly;
    # here the lift creates the FreeRV leaf the measurability walk needs)
    _lift_to_node: bool = True
    __array_ufunc__ = None  # make numpy defer to our reflected operators
    __array_priority__ = 1000

    # --------------------------------------------------- expression lifting
    def to_node(self, name=None):
        """Anonymous FreeRV node for this distribution, so unnamed
        ``.dist()`` objects compose into measurable expressions exactly like
        the reference's RandomVariable graph vars (e.g.
        ``pm.logp(pm.math.exp(pm.Normal.dist()), v)``, CustomDist ``dist=``).
        Cached: reusing the same dist object references the SAME random leaf
        (matching ``x = Normal.dist(); x + x`` reference semantics)."""
        node = getattr(self, "_anon_node", None)
        if node is None:
            from ..graph import FreeRV

            global _ANON_RV_COUNTER
            _ANON_RV_COUNTER += 1
            node = FreeRV(
                name or f"_anon_rv_{_ANON_RV_COUNTER}",
                dist=self,
                shape=self.shape,
                dtype=self.dtype,
            )
            self._anon_node = node
        return node

    # operator overloads delegate to the anonymous node so arithmetic over
    # unnamed dists builds graph expressions (reference TensorVariable ops)
    def __add__(self, o):
        return self.to_node() + o

    def __radd__(self, o):
        return o + self.to_node()

    def __sub__(self, o):
        return self.to_node() - o

    def __rsub__(self, o):
        return o - self.to_node()

    def __mul__(self, o):
        return self.to_node() * o

    def __rmul__(self, o):
        return o * self.to_node()

    def __truediv__(self, o):
        return self.to_node() / o

    def __rtruediv__(self, o):
        return o / self.to_node()

    def __pow__(self, o):
        return self.to_node() ** o

    def __rpow__(self, o):
        return o ** self.to_node()

    def __neg__(self):
        return -self.to_node()

    def __abs__(self):
        return abs(self.to_node())

    def __matmul__(self, o):
        return self.to_node() @ o

    def __rmatmul__(self, o):
        return o @ self.to_node()

    def __getitem__(self, idx):
        return self.to_node()[idx]

    def __gt__(self, o):
        return self.to_node() > o

    def __lt__(self, o):
        return self.to_node() < o

    def __ge__(self, o):
        return self.to_node() >= o

    def __le__(self, o):
        return self.to_node() <= o

    # ------------------------------------------------------------------ init
    def __new__(cls, name=None, *args, **kwargs):
        """Named-RV path: create the distribution and register it in the
        current model context (reference distribution.py:475-573)."""
        from ..model.core import Model

        if name is None or not isinstance(name, str):
            raise TypeError(
                f"Name argument to {cls.__name__} must be a string; got "
                f"{type(name).__name__}. Use .dist() for unnamed distributions."
            )
        observed = kwargs.pop("observed", None)
        dims = kwargs.pop("dims", None)
        transform = kwargs.pop("transform", UNSET)
        default_transform = kwargs.pop("default_transform", UNSET)
        initval = kwargs.pop("initval", None)
        total_size = kwargs.pop("total_size", None)
        model = Model.get_context()
        if observed is not None and kwargs.get("shape") is None and "size" not in kwargs:
            # infer shape from observed, as the reference does via make_obs_var
            obs_arr = model.normalize_observed(observed)
            kwargs.setdefault("shape", np.shape(obs_arr))
        if (dims is not None and kwargs.get("shape") is None
                and kwargs.get("size") is None and observed is None):
            dims_t = (dims,) if isinstance(dims, str) else tuple(dims)
            if all(isinstance(d, str) for d in dims_t):
                kwargs.setdefault("shape", model.shape_from_dims(dims))
            # dims containing None: the shape comes from the params
            # (reference issue #6335 — partially-dimmed RVs are valid)
        # kwargs only meaningful on the named path (e.g. Ordered* compute_p)
        named_kwargs = {
            k: kwargs.pop(k)
            for k in getattr(cls, "_named_only_kwargs", ())
            if k in kwargs
        }
        dist = cls.dist(*args, **kwargs)
        rv = model.register_rv(
            dist,
            name,
            observed=observed,
            dims=dims,
            transform=transform,
            default_transform=default_transform,
            initval=initval,
            total_size=total_size,
        )
        hook = getattr(cls, "_post_register", None)
        if hook is not None:
            hook(model, name, dist, rv, **named_kwargs)
        return rv

    @classmethod
    def dist(cls, *args, shape=None, size=None, **kwargs):
        """Unnamed-distribution path (reference distribution.py:597)."""
        obj = object.__new__(cls)
        if shape is not None and size is not None:
            raise ValueError(
                f"Passing both `shape` ({shape}) and `size` ({size}) is not "
                "supported (reference distribution.py:638)"
            )
        if isinstance(shape, (int, np.integer)):
            shape = (int(shape),)
        if isinstance(size, (int, np.integer)):
            size = (int(size),)
        obj._shape_arg = tuple(shape) if shape is not None else None
        # shape=x.shape on a pm.Data container stays live: remember the
        # owning DataNode so forward sampling re-resolves after set_data
        from ..graph import LiveShape

        obj._shape_node = shape.owner if isinstance(shape, LiveShape) else None
        obj._size_arg = tuple(size) if size is not None else None
        obj.__dist_init__(*args, **kwargs)
        obj._resolve_shapes()
        return obj

    def __dist_init__(self, *args, **kwargs):  # pragma: no cover - abstract
        raise NotImplementedError

    # ------------------------------------------------------------ params
    def param_values(self):
        return [getattr(self, n) for n in self.param_names]

    def resolve_params(self, env=None, memo=None):
        if memo is None:
            memo = {}
        return tuple(
            evaluate(p, env, memo) if p is not None else None
            for p in self.param_values()
        )

    # ------------------------------------------------------------ shapes
    def _event_shape(self, *param_shapes):
        return ()

    def _resolve_shapes(self):
        if getattr(self, "_shape_node", None) is not None:
            # shape=x.shape on mutable data: refresh from the live container
            self._shape_arg = tuple(self._shape_node.shape)
        pshapes = [_shape_of(p) for p in self.param_values()]
        pe = self.param_event_ndims or (0,) * len(pshapes)
        batch_shapes = []
        for s, e in zip(pshapes, pe):
            batch_shapes.append(s[: len(s) - e] if e else s)
        try:
            nat_batch = tuple(np.broadcast_shapes(*batch_shapes)) if batch_shapes else ()
        except ValueError as err:
            raise ShapeError(
                f"Incompatible parameter shapes for {type(self).__name__}: {pshapes}"
            ) from err
        ev = tuple(self._event_shape(*pshapes))
        if self._shape_arg is not None:
            full = self._shape_arg
            if self.event_ndim and ev and tuple(full[len(full) - len(ev):]) != ev:
                raise ShapeError(
                    f"shape {full} incompatible with event shape {ev} "
                    f"of {type(self).__name__}"
                )
            batch = tuple(full[: len(full) - len(ev)])
        elif self._size_arg is not None:
            batch = self._size_arg
        else:
            batch = nat_batch
        # validate params broadcast against requested batch
        try:
            np.broadcast_shapes(batch, nat_batch)
        except ValueError as err:
            raise ShapeError(
                f"size/shape {batch} incompatible with parameter batch shape "
                f"{nat_batch} for {type(self).__name__}"
            ) from err
        self.batch_shape = batch
        self.event_shape = ev

    @property
    def shape(self):
        return tuple(self.batch_shape) + tuple(self.event_shape)

    @property
    def ndim(self):
        return len(self.shape)

    @property
    def dtype(self):
        return intX() if self.is_discrete else floatX()

    def _resolve_aux(self, env, memo):
        aux = {}
        for n in self.aux_param_names:
            v = getattr(self, n, None)
            if v is not None:
                aux[n] = evaluate(v, env, memo)
        return aux

    # ------------------------------------------------------------ densities
    def logp(self, value, env=None, memo=None):
        if memo is None:
            memo = {}
        params = self.resolve_params(env, memo)
        value = self._cast_value(value)
        return self._logp(value, *params, **self._resolve_aux(env, memo))

    def logcdf(self, value, env=None, memo=None):
        if memo is None:
            memo = {}
        params = self.resolve_params(env, memo)
        value = self._cast_value(value)
        return self._logcdf(value, *params, **self._resolve_aux(env, memo))

    def logccdf(self, value, env=None, memo=None):
        params = self.resolve_params(env, memo)
        value = self._cast_value(value)
        try:
            return self._logccdf(value, *params)
        except NotImplementedError:
            # combinators (Mixture/Truncated/Censored/...) override the
            # PUBLIC logcdf; route the survival default through it
            from ..math import _log1mexp_jax

            return _log1mexp_jax(self.logcdf(value, env, memo))

    def icdf(self, q, env=None, memo=None):
        from .dist_math import check_icdf_value

        params = self.resolve_params(env, memo)
        q = jnp.asarray(q, dtype=floatX())
        return check_icdf_value(self._icdf(q, *params), q)

    def _logcdf(self, value, *params):
        raise NotImplementedError(
            f"logcdf not implemented for {type(self).__name__}"
        )

    def _logccdf(self, value, *params):
        # default via log1mexp(logcdf); stable upper tail needs override
        cdf = self._logcdf(value, *params)
        from ..math import _log1mexp_jax

        return _log1mexp_jax(cdf)

    def _icdf(self, q, *params):
        raise NotImplementedError(
            f"icdf not implemented for {type(self).__name__}"
        )

    def _cast_value(self, value):
        value = jnp.asarray(value)
        if not self.is_discrete and not jnp.issubdtype(value.dtype, jnp.floating):
            value = value.astype(floatX())
        return value

    # ------------------------------------------------------------ sampling
    def sample(self, key, sample_shape=(), env=None, memo=None):
        if isinstance(sample_shape, int):
            sample_shape = (sample_shape,)
        if getattr(self, "_shape_node", None) is not None:
            self._resolve_shapes()  # pick up post-set_data container size
        params = self.resolve_params(env, memo)
        full = tuple(sample_shape) + self.shape
        draw = self._sample(key, full, *params)
        # cast through the dist's dtype property (NOT intX blindly):
        # DiracDelta at a float point mass keeps the float dtype
        return jnp.asarray(draw, dtype=self.dtype)

    def _sample(self, key, shape, *params):  # pragma: no cover - abstract
        raise NotImplementedError(
            f"random sampling not implemented for {type(self).__name__}"
        )

    # ------------------------------------------------------------ moments
    def support_point(self, env=None, memo=None):
        """Finite, in-support initial value (reference support_point:679)."""
        params = self.resolve_params(env, memo)
        pt = self._support_point(*params)
        pt = jnp.asarray(pt, dtype=self.dtype)
        return jnp.broadcast_to(pt, self.shape)

    def _support_point(self, *params):
        raise NotImplementedError(
            f"support_point not implemented for {type(self).__name__}"
        )

    # ------------------------------------------------------------ transform
    def default_transform(self):
        """Default value transform from the support declaration
        (reference pymc/distributions/transforms.py:55 _default_transform)."""
        if self.is_discrete:
            return None
        s = self.support
        if s == "real":
            return None
        if s == "positive":
            return tr.log
        if s == "unit_interval":
            return tr.logodds
        if s == "interval":
            lower, upper = self._interval_bounds()
            return tr.IntervalTransform(lower, upper)
        if s == "simplex":
            return tr.simplex
        if s == "circular":
            return tr.circular
        if s == "ordered":
            return tr.ordered
        return None

    def _interval_bounds(self):  # pragma: no cover
        raise NotImplementedError

    def _gathered(self, shape, idx, batch_shape, extra_event=()):
        """Rebuild this dist restricted to flat batch indices `idx` of
        `batch_shape` (imputation). Reconstruction is BY NAME: several
        dists' stored param order differs from their constructor's
        positional order (NegativeBinomial stores (n, p) but its ctor is
        (mu, alpha, p, n); BetaBinomial stores (n, alpha, beta) vs ctor
        (alpha, beta, n)) — positional reconstruction scrambled those
        silently. Combinators (Censored/Truncated) override to also gather
        their base dist."""
        pe = self.param_event_ndims or (0,) * len(self.param_names)
        kwargs = {
            pname: _gather_batch_param(p, batch_shape, idx, e)
            for pname, p, e in zip(self.param_names, self.param_values(), pe)
            if p is not None
        }
        return type(self).dist(
            shape=tuple(shape) + tuple(extra_event), **kwargs
        )

    def __repr__(self):
        return f"<{type(self).__name__} shape={self.shape}>"


class Continuous(Distribution):
    is_discrete = False


class Discrete(Distribution):
    is_discrete = True
    support = "discrete"

    def _cast_value(self, value):
        return jnp.asarray(value)


class DiracDelta(Discrete):
    """Point mass at c (reference distribution.py:740). Discrete-flavored:
    logp is 0 at c and -inf elsewhere."""

    param_names = ("c",)

    def __dist_init__(self, c):
        self.c = _as_param(c, float_ok=False)

    @property
    def dtype(self):
        c = self.c
        if is_node(c):
            return c.dtype
        return jnp.asarray(c).dtype

    def _logp(self, value, c):
        match = jnp.isclose(
            jnp.asarray(value, dtype=floatX()), jnp.asarray(c, dtype=floatX())
        )
        return jnp.where(match, 0.0, -jnp.inf)

    def _logcdf(self, value, c):
        # log P(X <= value) = 0 where value >= c else -inf (reference
        # DiracDelta.logcdf)
        return jnp.where(value >= c, 0.0, -jnp.inf)

    def _sample(self, key, shape, c):
        return jnp.broadcast_to(c, shape)

    def _support_point(self, c):
        return c

    def _cast_value(self, value):
        return jnp.asarray(value)


def _gather_batch_param(p, shape, idx, event_ndim=0):
    """Broadcast a dist param over the VALUE batch `shape` (keeping its own
    trailing event dims, e.g. Categorical p / Ordered cutpoints) and gather
    the flat indices `idx` (imputation)."""
    if p is None:
        return None

    def _g(x):
        x = jnp.asarray(x)
        ev = x.shape[x.ndim - event_ndim:] if event_ndim else ()
        x = jnp.broadcast_to(x, tuple(shape) + ev)
        return x.reshape((-1,) + ev)[idx]

    if is_node(p):
        from ..graph import apply

        return apply(_g, p)
    return _g(p)


class _PartialObservedSlots(Distribution):
    """Value slots for the missing entries of an UNSEPARABLY-masked
    multivariate RV (mask splits within event rows): the density is carried
    entirely by the joint observed term, so these slots contribute zero
    (reference partial_observed_rv_logprob returns zeros for the unobserved
    component, distributions/distribution.py:900-918); forward draws gather
    the missing positions of a full base draw."""

    param_names = ()

    def __dist_init__(self, base, mask):
        self.base = base
        self._mask = np.asarray(mask, bool)
        self._missing_idx = np.nonzero(self._mask.ravel())[0]
        self.is_discrete = base.is_discrete

    def default_transform(self):
        return None

    def logp(self, value, env=None, memo=None):
        return jnp.zeros(jnp.shape(value), dtype=floatX())

    def _logp(self, value):
        return jnp.zeros(jnp.shape(value), dtype=floatX())

    def sample(self, key, sample_shape=(), env=None, memo=None):
        if isinstance(sample_shape, int):
            sample_shape = (sample_shape,)
        draw = self.base.sample(key, tuple(sample_shape), env, memo)
        flat = jnp.reshape(draw, tuple(sample_shape) + (-1,))
        return flat[..., self._missing_idx]

    def support_point(self, env=None, memo=None):
        sp = jnp.broadcast_to(
            self.base.support_point(env, memo), self.base.shape
        )
        return jnp.ravel(sp)[self._missing_idx]


class _PartialObservedJoint(Distribution):
    """Observed component of an unseparably-masked multivariate RV: its logp
    is the JOINT base density of the value with the missing entries scattered
    in from the `{name}_unobserved` slots (reference PartialObservedRV logp —
    the joined value is rebuilt and the full logp attributed to the observed
    part)."""

    param_names = ()

    def __dist_init__(self, base, mask, free_name):
        self.base = base
        self._mask = np.asarray(mask, bool)
        self._missing_idx = np.nonzero(self._mask.ravel())[0]
        self._free_name = free_name
        self.is_discrete = base.is_discrete

    def default_transform(self):
        return None

    def logp(self, value, env=None, memo=None):
        flat = jnp.ravel(jnp.asarray(value, self.base.dtype))
        free_vals = (env or {}).get(self._free_name)
        if free_vals is not None:
            flat = flat.at[self._missing_idx].set(
                jnp.ravel(jnp.asarray(free_vals, self.base.dtype))
            )
        combined = flat.reshape(self._mask.shape)
        return self.base.logp(combined, env, memo)

    def sample(self, key, sample_shape=(), env=None, memo=None):
        # the full-shape base draw; the combined deterministic overwrites the
        # missing entries with the slots' draw
        if isinstance(sample_shape, int):
            sample_shape = (sample_shape,)
        return self.base.sample(key, tuple(sample_shape), env, memo)

    def support_point(self, env=None, memo=None):
        return jnp.broadcast_to(
            self.base.support_point(env, memo), self.base.shape
        )


# re-export for concrete modules
as_param = _as_param


# reference name-compat: SymbolicRandomVariable is the reference's base for
# derived/composite RVs (distribution.py SymbolicRandomVariable); here every
# derived density IS a Distribution subclass (Censored/Truncated/Mixture/...)
SymbolicRandomVariable = Distribution
