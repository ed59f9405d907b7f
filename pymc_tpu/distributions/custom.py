"""User-defined distributions.

Parity: reference pymc/distributions/custom.py:477 (CustomDist) /
DensityDist:851. The reference's `dist=` symbolic variant derives logp
through the graph-rewrite engine; here logp is supplied explicitly (the
combinator strategy) while `dist=` covers forward sampling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import floatX, intX
from .distribution import Continuous, Distribution, as_param
from . import transforms as tr

__all__ = ["CustomDist", "DensityDist"]


class CustomDist(Distribution):
    """Distribution from user callables.

    Parameters (as in the reference, custom.py:477):
      *dist_params : positional parameters, passed to every callable
      logp(value, *params)          : log-density (required for inference)
      logcdf(value, *params)        : optional
      random(*params, rng=key, size=shape) : forward sampler (optional)
      dist(*params, size=shape, rng=key)   : alternative generative fn used
          for forward sampling only (the reference also auto-derives its
          logp; supply logp= explicitly here)
      support_point(*params)        : optional initial value
      ndim_supp / ndims_params      : event dims
      transform                     : optional value transform
    """

    param_names = ()

    def __dist_init__(
        self,
        *dist_params,
        logp=None,
        logcdf=None,
        random=None,
        dist=None,
        support_point=None,
        moment=None,
        ndim_supp=0,
        ndims_params=None,
        signature=None,
        dtype="floatX",
        transform=None,
        class_name="CustomDist",
    ):
        if signature is not None:
            # gufunc-style signature "(n),(m)->(n)" resolves ndims_params /
            # ndim_supp (reference custom.py signature support)
            ndims_params, ndim_supp = _parse_signature(
                signature, len(dist_params), class_name
            )
        self.dist_params = tuple(as_param(p) for p in dist_params)
        self.param_names = tuple(f"_p{i}" for i in range(len(self.dist_params)))
        self.param_event_ndims = tuple(
            ndims_params if ndims_params is not None
            else (0,) * len(self.dist_params)
        )
        self._logp_fn = logp
        self._logcdf_fn = logcdf
        self._random_fn = random
        self._dist_fn = dist
        self._support_point_fn = support_point or moment
        self.event_ndim = int(ndim_supp)
        self._dtype_arg = dtype
        self._transform = transform
        self._name = class_name
        self._derived = None
        if logp is None and dist is None:
            raise TypeError(
                "CustomDist requires logp= or a symbolic dist= generating "
                "function (reference custom.py:477)"
            )
        if dist is not None:
            # symbolic variant (reference CustomSymbolicDistRV, custom.py:214):
            # call the generative fn with the params and derive the density
            # from the returned expression via the measurability engine;
            # explicit logp=/logcdf=/support_point= callables still override
            # the derived methods (reference test_custom_methods)
            self._derived = self._derive_dist()

    def _derive_dist(self):
        """Build the expression the generative fn returns and derive its
        density (reference custom.py:214 CustomSymbolicDistRV — the
        reference rewrites the returned RandomVariable graph; here the
        expression's Distribution comes from dist_from_expression)."""
        from ..graph import FreeRV, Node, ObservedRV
        from .transformed import dist_from_expression

        size = self._size_arg
        if size is None and self._shape_arg is not None:
            sa = self._shape_arg
            size = (
                sa[: len(sa) - self.event_ndim] if self.event_ndim else sa
            )
        expr = self._dist_fn(*self.dist_params, size)
        if isinstance(expr, Distribution):
            derived = expr
        elif isinstance(expr, (FreeRV, ObservedRV)):
            derived = expr.dist
        elif isinstance(expr, Node):
            derived = dist_from_expression(expr)
        else:
            raise TypeError(
                f"{self._name}: dist= must return a distribution or a "
                "random expression (got "
                f"{type(expr).__name__}); eager samplers belong in random="
            )
        # adopt the derived result's full shape/event structure
        self._shape_arg = tuple(int(s) for s in derived.shape)
        if self.event_ndim == 0:
            self.event_ndim = int(derived.event_ndim)
        return derived

    def param_values(self):
        return list(self.dist_params)

    @property
    def is_discrete(self):
        if self._dtype_arg in ("int32", "int64", "int"):
            return True
        if self._derived is not None:
            return bool(self._derived.is_discrete)
        return False

    @is_discrete.setter
    def is_discrete(self, v):
        pass

    @property
    def dtype(self):
        if self._dtype_arg in ("int32", "int64", "int"):
            return intX()
        if self._derived is not None:
            return self._derived.dtype
        return floatX()

    def default_transform(self):
        if self._transform is not None:
            return self._transform
        if self._derived is not None and self._logp_fn is None:
            # the derived density knows its own support (reference infers
            # value transforms from the rewritten graph)
            return self._derived.default_transform()
        return None

    def _event_shape(self, *param_shapes):
        if self._derived is not None:
            return tuple(self._derived.event_shape)
        if self.event_ndim == 0:
            return ()
        if self._shape_arg is not None:
            return tuple(self._shape_arg[-self.event_ndim:])
        # infer from the first param with enough event dims
        for s, e in zip(param_shapes, self.param_event_ndims):
            if e >= self.event_ndim:
                return tuple(s[len(s) - self.event_ndim:])
        raise ValueError(
            f"{self._name}: cannot infer event shape; pass shape= explicitly"
        )

    # explicit user callables override; otherwise the symbolic dist='s
    # derived density serves every query (reference custom.py:214)
    def logp(self, value, env=None, memo=None):
        if self._logp_fn is None and self._derived is not None:
            return self._derived.logp(value, env, memo)
        return super().logp(value, env, memo)

    def logcdf(self, value, env=None, memo=None):
        if self._logcdf_fn is None and self._derived is not None:
            return self._derived.logcdf(value, env, memo)
        return super().logcdf(value, env, memo)

    def logccdf(self, value, env=None, memo=None):
        if self._logcdf_fn is None and self._derived is not None:
            return self._derived.logccdf(value, env, memo)
        return super().logccdf(value, env, memo)

    def icdf(self, q, env=None, memo=None):
        if self._derived is not None:
            return self._derived.icdf(q, env, memo)
        return super().icdf(q, env, memo)

    def sample(self, key, sample_shape=(), env=None, memo=None):
        if self._random_fn is None and self._derived is not None:
            return self._derived.sample(key, sample_shape, env, memo)
        return super().sample(key, sample_shape, env, memo)

    def support_point(self, env=None, memo=None):
        if self._support_point_fn is None and self._derived is not None:
            return self._derived.support_point(env, memo)
        return super().support_point(env, memo)

    def _logp(self, value, *params):
        if self._logp_fn is None:
            raise NotImplementedError(f"{self._name} has no logp")
        return jnp.asarray(self._logp_fn(value, *params))

    def _logcdf(self, value, *params):
        if self._logcdf_fn is None:
            raise NotImplementedError(f"{self._name} has no logcdf")
        return jnp.asarray(self._logcdf_fn(value, *params))

    def _sample(self, key, shape, *params):
        if self._random_fn is not None:
            return jnp.asarray(self._random_fn(*params, rng=key, size=shape))
        raise NotImplementedError(
            f"{self._name} has no random= generating function"
        )

    def _support_point(self, *params):
        if self._support_point_fn is not None:
            return jnp.asarray(self._support_point_fn(*params))
        # default: zeros (reference uses zeros/ones heuristics)
        return jnp.zeros((), dtype=self.dtype)


def _parse_signature(signature, n_params, class_name):
    """Parse a gufunc signature "(n),(m)->(n)" into per-param core ndims and
    the output support ndim (reference CustomDist signature= handling)."""
    import re

    if "->" not in signature:
        raise ValueError(
            f"{class_name}: invalid signature {signature!r} (missing '->')"
        )
    ins, outs = signature.split("->")
    in_specs = re.findall(r"\(([^)]*)\)", ins)
    out_specs = re.findall(r"\(([^)]*)\)", outs)
    if not out_specs:
        raise ValueError(
            f"{class_name}: invalid signature {signature!r} (no output spec)"
        )
    if len(in_specs) != n_params:
        raise ValueError(
            f"{class_name}: signature {signature!r} declares "
            f"{len(in_specs)} inputs but {n_params} dist_params were given"
        )

    def core(spec):
        spec = spec.strip()
        return 0 if not spec else len(spec.split(","))

    return [core(sp) for sp in in_specs], core(out_specs[0])


DensityDist = CustomDist  # deprecated alias (reference custom.py:851)
