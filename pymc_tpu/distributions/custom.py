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
        dtype="floatX",
        transform=None,
        class_name="CustomDist",
    ):
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
        if logp is None and dist is None:
            raise TypeError(
                "CustomDist requires logp= (and optionally random=/dist= for "
                "forward sampling). The reference's automatic logp derivation "
                "from dist= is replaced by explicit logp in this framework."
            )

    def param_values(self):
        return list(self.dist_params)

    @property
    def is_discrete(self):
        return self._dtype_arg in ("int32", "int64", "int")

    @is_discrete.setter
    def is_discrete(self, v):
        pass

    @property
    def dtype(self):
        return intX() if self.is_discrete else floatX()

    def default_transform(self):
        return self._transform

    def _event_shape(self, *param_shapes):
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
        if self._dist_fn is not None:
            return jnp.asarray(self._dist_fn(*params, size=shape, rng=key))
        raise NotImplementedError(
            f"{self._name} has no random=/dist= generating function"
        )

    def _support_point(self, *params):
        if self._support_point_fn is not None:
            return jnp.asarray(self._support_point_fn(*params))
        # default: zeros (reference uses zeros/ones heuristics)
        return jnp.zeros((), dtype=self.dtype)


DensityDist = CustomDist  # deprecated alias (reference custom.py:851)
