"""The Model context — the user-facing model-building layer.

Parity: reference pymc/model/core.py (Model:1647 context manager,
register_rv:1907, make_obs_var:1984, create_value_var:2085, logp:612,
dlogp:697, Deterministic:2467, Potential:2554, point_logps:1370,
check_start_vals:1319) and pymc/data.py (pm.Data:222).

TPU-native design: the model is a static DAG of graph.Node objects; its joint
log-density is a pure function {value_name: unconstrained array} -> scalar
that JAX traces into ONE fused XLA program (replacing the reference's entire
PyTensor compile pipeline, SURVEY.md §3.2). Gradients via jax.grad; chains via
vmap; devices via sharding — all composition, no translation layer.
"""

from __future__ import annotations

import functools
import threading
import warnings

import numpy as np
import jax
import jax.numpy as jnp

from ..blocking import RaveledInfo, ravel_point, unravel_vector
from ..config import floatX, intX
from ..exceptions import ImputationWarning, SamplingError, ShapeError, ShapeWarning
from ..graph import (
    ConstantNode,
    DataNode,
    DeterministicNode,
    FreeRV,
    Node,
    ObservedRV,
    as_node,
    evaluate,
    is_node,
)

__all__ = [
    "Model",
    "modelcontext",
    "Deterministic",
    "Potential",
    "Data",
    "ConstantData",
    "MutableData",
    "set_data",
    "compile_fn",
    "BaseModel",
    "FrozenModel",
    "Point",
]


class _ContextStack(threading.local):
    def __init__(self):
        self.stack = []


_MODEL_CONTEXT = _ContextStack()


def modelcontext(model=None):
    """Return the given model or the innermost context model
    (reference model/core.py:439)."""
    if model is not None:
        return model
    return Model.get_context()


class _InitContextMeta(type):
    """Push the instance onto the model-context stack DURING __init__ so
    class-based models (``class MyModel(pm.Model)``) can register variables
    in their constructor (reference ContextMeta/InitContextMeta,
    model/core.py context machinery)."""

    def __call__(cls, *args, **kwargs):
        instance = cls.__new__(cls)
        _MODEL_CONTEXT.stack.append(instance)
        try:
            instance.__init__(*args, **kwargs)
        finally:
            _MODEL_CONTEXT.stack.pop()
        return instance


class Model(metaclass=_InitContextMeta):
    """Bayesian model: a named collection of random variables, deterministics
    and potentials, with coords/dims bookkeeping.

    Usage matches the reference exactly::

        with pm.Model(coords={"g": groups}) as model:
            mu = pm.Normal("mu", 0, 1)
            sigma = pm.HalfNormal("sigma", 1)
            y = pm.Normal("y", mu, sigma, observed=data, dims="g")
    """

    @classmethod
    def get_context(cls, error_if_none=True):
        stack = _MODEL_CONTEXT.stack
        if not stack:
            if error_if_none:
                raise TypeError(
                    "No model on context stack. Define variables inside a "
                    "`with pm.Model():` block, or pass model=... explicitly."
                )
            return None
        return stack[-1]

    def __init__(self, name="", coords=None, check_bounds=True, model=None):
        self.name = str(name)
        if self.name.startswith("::") or self.name.endswith("::"):
            raise KeyError(
                f"name {self.name!r} cannot start or end with the '::' "
                "separator"
            )
        if model is not None:
            self.parent = model
        else:
            # self is already on the context stack during __init__
            # (_InitContextMeta): the parent is the nearest enclosing model
            # that is not self
            self.parent = next(
                (m for m in reversed(_MODEL_CONTEXT.stack) if m is not self),
                None,
            )
        self.check_bounds = check_bounds

        if self.parent is not None:
            # nested sub-model: share registries with the root, prefix names
            root = self.parent.root
            self._root = root
        else:
            self._root = self
            self.named_vars = {}
            self.free_RVs = []
            self.observed_RVs = []
            self.deterministics = []
            self.potentials = []
            self.data_vars = []
            self.rvs_to_initial_values = {}
            self._coords = {}
            self._dim_lengths = {}
            self._data_version = 0
            self._dim_definers = {}
            self._fn_cache = {}
        if coords is not None:
            self.add_coords(coords)

    # ------------------------------------------------------------- context
    def __enter__(self):
        _MODEL_CONTEXT.stack.append(self)
        return self

    def __exit__(self, *exc):
        _MODEL_CONTEXT.stack.pop()
        return False

    @property
    def root(self):
        return self._root

    @property
    def isroot(self):
        return self.parent is None

    def _delegate(self, attr):
        return getattr(self._root, attr)

    def __getattr__(self, attr):
        # registry attributes live on the root for nested sub-models
        if attr in (
            "named_vars", "free_RVs", "observed_RVs", "deterministics",
            "potentials", "data_vars", "rvs_to_initial_values", "_coords",
            "_dim_lengths", "_data_version", "_dim_definers", "_fn_cache",
        ):
            root = self.__dict__.get("_root")
            if root is not None and root is not self:
                return getattr(root, attr)
            raise AttributeError(f"'Model' object has no attribute '{attr}'")
        # model variables are reachable as attributes by their LOCAL name
        # (reference class-based-model contract: `self.v2` after
        # `pm.Normal("v2")` inside the model)
        if not attr.startswith("_") and "name" in self.__dict__:
            named = getattr(self.__dict__.get("_root", self), "named_vars", None)
            if named is not None:
                full = self.name_for(attr)
                if full in named:
                    return named[full]
                if attr in named:
                    return named[attr]
        raise AttributeError(f"'Model' object has no attribute '{attr}'")

    def name_for(self, name):
        """Prefix a variable name with the (nested) model name
        (reference core.py:1089-1116 tree naming)."""
        if self.name:
            prefix = self.name
            m = self.parent
            while m is not None and m.name:
                prefix = f"{m.name}::{prefix}"
                m = m.parent
            return f"{prefix}::{name}"
        if self.parent is not None and not self.isroot:
            return self.parent.name_for(name)
        return name

    # ------------------------------------------------------------- coords
    @property
    def coords(self):
        return dict(self._coords)

    @property
    def dim_lengths(self):
        return dict(self._dim_lengths)

    def add_coord(self, name, values=None, length=None):
        if values is None and length is None:
            raise ValueError(f"Either values or length must be given for coord {name}")
        if name in self.named_vars:
            raise ValueError(
                f"The coordinate name '{name}' conflicts with an existing "
                "model variable name."
            )
        if values is not None:
            # unwrap xarray coords / DataArrays to plain value tuples
            # (reference test_xarray_coord_values_unwrapped)
            values = tuple(np.asarray(values).tolist())
            length = len(values)
        if name in self._dim_lengths and self._dim_lengths[name] != length:
            raise ShapeError(
                f"Duplicate coord {name} with conflicting length",
                actual=length,
                expected=self._dim_lengths[name],
            )
        self._coords[name] = values
        self._dim_lengths[name] = int(length)

    def add_coords(self, coords):
        for k, v in coords.items():
            self.add_coord(k, values=v)

    def set_dim(self, name, new_length, coord_values=None):
        """Resize a dimension (reference core.py:894+924). Static-shape
        semantics: downstream compiled functions re-trace on next call."""
        if (
            coord_values is None
            and self._coords.get(name) is not None
            and int(new_length) != self._dim_lengths.get(name)
        ):
            raise ValueError(
                f"The dim '{name}' has coord values; pass `coord_values` "
                "with the new length to update them (reference core.py:894)."
            )
        if coord_values is not None and len(coord_values) != new_length:
            raise ShapeError(
                f"Length of new coordinate values for dimension '{name}' "
                "does not match the new length",
                actual=len(coord_values),
                expected=new_length,
            )
        self._dim_lengths[name] = int(new_length)
        if coord_values is not None:
            self._coords[name] = tuple(np.asarray(coord_values).tolist())
        self.root._data_version += 1

    def shape_from_dims(self, dims):
        if isinstance(dims, str):
            dims = (dims,)
        shape = []
        for d in dims:
            if d is None:
                raise ValueError("dims entries must be named for shape inference")
            if d not in self._dim_lengths:
                raise KeyError(
                    f"Unknown dimension '{d}'. Declare it via coords= or add_coord."
                )
            shape.append(self._dim_lengths[d])
        return tuple(shape)

    # --------------------------------------------------------------- vars
    @property
    def basic_RVs(self):
        return self.free_RVs + self.observed_RVs

    @property
    def unobserved_RVs(self):
        return self.free_RVs + self.deterministics

    @property
    def continuous_value_vars(self):
        return [rv for rv in self.free_RVs if not rv.dist.is_discrete]

    @property
    def discrete_value_vars(self):
        return [rv for rv in self.free_RVs if rv.dist.is_discrete]

    @property
    def value_names(self):
        return [rv.value_name for rv in self.free_RVs]

    @property
    def value_vars(self):
        """The value-variable names of the free RVs, in registration order
        (reference Model.value_vars returns the value TENSORS; here the
        value space is named, so the names are the variables)."""
        return [rv.value_name for rv in self.free_RVs]

    def __getitem__(self, key):
        return self.named_vars[key]

    def __contains__(self, key):
        return key in self.named_vars

    def add_named_variable(self, var, dims=None):
        if var.name is None:
            raise ValueError("Variable is unnamed")
        if var.name.endswith("::") or var.name.startswith("::"):
            raise KeyError(
                f"name {var.name!r} cannot start or end with the '::' "
                "separator (reference tree-naming contract)"
            )
        if "/" in var.name:
            raise ValueError(f"name {var.name!r} cannot contain '/'")
        if var.name in self.named_vars:
            raise ValueError(f"Variable name {var.name} already exists.")
        if var.name in self._dim_lengths:
            raise ValueError(
                f"The variable name '{var.name}' conflicts with an existing "
                "dimension name."
            )
        if dims is not None:
            dims = (dims,) if isinstance(dims, str) else tuple(dims)
            for d in dims:
                if d is not None and not isinstance(d, str):
                    raise TypeError(f"Dims must be string or None, got: {d}")
            var_shape = getattr(var, "shape", None)
            if var_shape is not None and len(dims) != len(tuple(var_shape)):
                raise ValueError(
                    f"{len(dims)} dim labels were provided for a variable "
                    f"with {len(tuple(var_shape))} dimensions "
                    f"(reference add_named_variable check)"
                )
            for d in dims:
                if d is not None and d not in self._dim_lengths:
                    raise ValueError(
                        f"Dimension '{d}' is not specified in `coords`."
                    )
        self.named_vars[var.name] = var
        if dims is not None:
            var.dims = tuple(dims)
        return var

    @property
    def named_vars_to_dims(self):
        """Mapping of variable name -> named dims tuple (reference
        model/core.py Model.named_vars_to_dims)."""
        return {
            name: tuple(v.dims)
            for name, v in self.named_vars.items()
            if getattr(v, "dims", None)
        }

    def normalize_observed(self, observed):
        if is_node(observed):
            from ..graph import rv_ancestors

            if rv_ancestors([observed]):
                # reference make_obs_var: observed data cannot be (or
                # depend on) a random variable
                raise TypeError(
                    "Variables that depend on random variables cannot be "
                    "used for observed data (got a random-variable "
                    f"expression {observed!r})."
                )
            observed = evaluate(observed)
        arr = np.asarray(observed)
        return arr

    # --------------------------------------------------------- register_rv
    def register_rv(
        self,
        dist,
        name,
        *,
        observed=None,
        dims=None,
        transform="__unset__",
        default_transform="__unset__",
        initval=None,
        total_size=None,
    ):
        """Create a FreeRV or ObservedRV node for `dist` named `name`
        (reference model/core.py:1907)."""
        from ..distributions.distribution import UNSET

        if isinstance(transform, str) and transform == "__unset__":
            transform = UNSET
        if isinstance(default_transform, str) and default_transform == "__unset__":
            default_transform = UNSET

        name = self.name_for(name)
        if dims is not None and isinstance(dims, str):
            dims = (dims,)
        if dims is not None and len(dims) < len(dist.shape):
            # partial dims label the TRAILING axes (pm.dims core_dims on an
            # observed var with unnamed batch axes); pad the lead with None
            dims = (None,) * (len(dist.shape) - len(dims)) + tuple(dims)
        # register any new dims implied
        if dims is not None:
            for d, ln in zip(dims, dist.shape):
                if d is not None and d not in self._dim_lengths:
                    self.add_coord(d, length=ln)
                    self.root._dim_definers[d] = ("rv", name)

        if observed is not None:
            return self._make_obs_var(dist, name, observed, dims, total_size)

        # resolve transform (reference create_value_var :2085): the user
        # `transform=` CHAINS on top of the default transform (dist default,
        # or `default_transform=` when given); `default_transform=None`
        # disables the default. `transform=None` is the deprecated way to
        # disable and warns (reference TestTransformArgs.test_transform_warning).
        if transform is None:
            warnings.warn(
                "To disable default transform, please use "
                "default_transform=None instead of transform=None. Setting "
                "transform to None will not have any effect in future.",
                UserWarning,
                stacklevel=3,
            )
            if default_transform is UNSET:
                default_transform = None
            transform = UNSET
        base = (
            dist.default_transform()
            if default_transform is UNSET else default_transform
        )
        if base is False:
            base = None
        user = None if transform is UNSET else transform
        if user is False:
            user = None
        if base is None:
            tr = user
        elif user is None:
            tr = base
        else:
            from ..distributions.transforms import ChainedTransform

            tr = ChainedTransform([base, user])
        if tr is not None:
            if dist.is_discrete:
                raise ValueError(
                    "Transformations for discrete distributions are not "
                    f"allowed (got {tr!r} for {name!r}); discrete values "
                    "have no continuous unconstrained space."
                )
            if getattr(tr, "event_ndim", 0) < dist.event_ndim:
                raise NotImplementedError(
                    f"Univariate transform {type(tr).__name__} cannot be "
                    f"applied to multivariate {name!r} (event_ndim="
                    f"{dist.event_ndim}); the Jacobian correction would "
                    "broadcast against the collapsed event density. Use a "
                    "vector transform (reference raises the same)."
                )

        rv = FreeRV(
            name,
            dist,
            shape=dist.shape,
            dtype=dist.dtype,
            transform=tr,
            model=self.root,
        )
        self.free_RVs.append(rv)
        self.add_named_variable(rv, dims)
        if initval is not None:
            self.rvs_to_initial_values[name] = initval
        self.root._fn_cache.clear()
        return rv

    def _make_obs_var(self, dist, name, observed, dims, total_size):
        if is_node(observed):
            from ..graph import rv_ancestors

            if rv_ancestors([observed]):
                # reference make_obs_var: observed data cannot be (or
                # depend on) a random variable
                raise TypeError(
                    f"Variables that depend on other nodes cannot be used "
                    f"for observed data (got a random variable for {name!r})."
                )
            # symbolic observed (Minibatch view): no NaN/shape normalization
            rv = ObservedRV(name, dist, observed, model=self.root)
            if total_size is not None:
                rv.scale = float(np.prod(total_size)) / float(
                    max(int(np.prod(observed.shape)), 1)
                )
            else:
                rv.scale = 1.0
            self.observed_RVs.append(rv)
            self.add_named_variable(rv, dims)
            self.root._fn_cache.clear()
            return rv
        arr = self.normalize_observed(observed)
        if dist.is_discrete:
            if not np.issubdtype(arr.dtype, np.integer):
                if np.isnan(arr).any():
                    return self._make_imputed(dist, name, arr, dims, total_size)
                arr = arr.astype(np.int64)
        else:
            arr = arr.astype(np.asarray(0, dtype=floatX()).dtype)
            if np.isnan(arr).any():
                return self._make_imputed(dist, name, arr, dims, total_size)
        try:
            np.broadcast_shapes(arr.shape, dist.shape)
        except ValueError as err:
            raise ShapeError(
                f"Observed data shape incompatible with {name}",
                actual=arr.shape,
                expected=dist.shape,
            ) from err
        rv = ObservedRV(name, dist, jnp.asarray(arr), model=self.root)
        if total_size is not None:
            rv.scale = float(np.prod(total_size)) / float(
                max(int(np.prod(arr.shape)), 1)
            )
        else:
            rv.scale = 1.0
        self.observed_RVs.append(rv)
        self.add_named_variable(rv, dims)
        self.root._fn_cache.clear()
        return rv

    def _make_imputed(self, dist, name, arr, dims, total_size):
        """Automatic imputation of partially-observed data (reference
        PartialObservedRV, distribution.py:782 + model/core.py:2033-2060).

        Creates `{name}_unobserved` free entries for the NaN positions; the
        combined vector is registered as a deterministic named `{name}` and
        the observed entries contribute a masked likelihood.
        """
        warnings.warn(
            f"Data in {name} contains missing values and will be "
            "automatically imputed from the sampling distribution.",
            ImputationWarning,
        )
        mask = np.isnan(arr)
        ev_n = dist.event_ndim

        if ev_n == 0:
            free, obs = self._split_imputed_univariate(dist, name, arr, mask)
        else:
            # multivariate: SEPARABLE when the mask is constant across the
            # event dims (each event row fully observed or fully missing) —
            # then the components are two independent RVs over batch rows;
            # otherwise the joint PartialObservedRV semantics apply
            # (reference create_partial_observed_rv,
            # distributions/distribution.py:789-900)
            trimmed = mask[(...,) + (0,) * ev_n]
            expanded = np.broadcast_to(
                np.expand_dims(trimmed, axis=tuple(range(-ev_n, 0))), mask.shape
            )
            if np.array_equal(mask, expanded):
                free, obs = self._split_imputed_separable(
                    dist, name, arr, trimmed
                )
            else:
                free, obs = self._split_imputed_joint(dist, name, arr, mask)

        missing_idx = np.nonzero(mask.ravel())[0]

        def _combine(f, obs_full):
            out = jnp.ravel(jnp.asarray(obs_full, floatX()))
            out = out.at[missing_idx].set(jnp.ravel(jnp.asarray(f, floatX())))
            return out.reshape(arr.shape)

        # the combined value joins the RESAMPLED observed component in
        # forward sampling (the obs node resolves from env there) and the
        # original data in logp-land (reference joined_rv semantics)
        combined = DeterministicNode(_combine, (free, obs), name=name)
        self.deterministics.append(combined)
        self.add_named_variable(combined, dims)
        self.root._fn_cache.clear()
        return combined

    def _gathered_dist(self, dist, shape, idx, batch_shape, extra_event=()):
        """Rebuild `dist` restricted to flat batch indices `idx` (delegates
        to Distribution._gathered so combinators can override)."""
        return dist._gathered(shape, idx, batch_shape, extra_event)

    def _split_imputed_univariate(self, dist, name, arr, mask):
        n_missing = int(mask.sum())
        missing_idx = np.nonzero(mask.ravel())[0]
        filled = _impute_fill(arr, mask, dist.is_discrete)
        gathered = self._gathered_dist(dist, (n_missing,), missing_idx, arr.shape)
        free = FreeRV(
            f"{name}_unobserved",
            gathered,
            shape=(n_missing,),
            dtype=gathered.dtype,
            transform=gathered.default_transform(),
            model=self.root,
        )
        self.free_RVs.append(free)
        self.add_named_variable(free)
        obs = ObservedRV(
            f"{name}_observed", dist, filled, model=self.root, mask=jnp.asarray(mask)
        )
        obs.scale = 1.0
        self.observed_RVs.append(obs)
        self.add_named_variable(obs)
        return free, obs

    def _split_imputed_separable(self, dist, name, arr, row_mask):
        """Event rows are each fully observed or fully missing: split into
        two independent multivariate RVs over the batch axis (reference
        create_partial_observed_rv rewrite path — the unobserved part keeps
        the dist's default transform)."""
        ev = tuple(dist.event_shape)
        batch_shape = arr.shape[: arr.ndim - len(ev)]
        missing_rows = np.nonzero(row_mask.ravel())[0]
        n_rows = len(missing_rows)
        filled = _impute_fill(arr, np.isnan(arr), dist.is_discrete)
        gathered = self._gathered_dist(
            dist, (n_rows,), missing_rows, batch_shape, extra_event=ev
        )
        free = FreeRV(
            f"{name}_unobserved",
            gathered,
            shape=(n_rows,) + ev,
            dtype=gathered.dtype,
            transform=gathered.default_transform(),
            model=self.root,
        )
        self.free_RVs.append(free)
        self.add_named_variable(free)
        obs = ObservedRV(
            f"{name}_observed",
            dist,
            filled,
            model=self.root,
            mask=jnp.asarray(row_mask),  # batch-shaped: masks whole rows
        )
        obs.scale = 1.0
        self.observed_RVs.append(obs)
        self.add_named_variable(obs)
        return free, obs

    def _split_imputed_joint(self, dist, name, arr, mask):
        """Mask splits within event rows: the density cannot separate. The
        missing entries become transform-free value slots with ZERO own
        density; the observed component carries the JOINT logp of the
        scatter-combined value (reference PartialObservedRV,
        partial_observed_rv_logprob distribution.py:900-918)."""
        from ..distributions.distribution import (
            _PartialObservedJoint,
            _PartialObservedSlots,
        )

        missing_idx = np.nonzero(mask.ravel())[0]
        n_missing = len(missing_idx)
        filled = jnp.asarray(np.where(mask, 0.0, arr))
        slots = _PartialObservedSlots.dist(dist, mask, shape=(n_missing,))
        free = FreeRV(
            f"{name}_unobserved",
            slots,
            shape=(n_missing,),
            dtype=slots.dtype,
            transform=None,
            model=self.root,
        )
        self.free_RVs.append(free)
        self.add_named_variable(free)
        joint = _PartialObservedJoint.dist(dist, mask, free.name, shape=arr.shape)
        obs = ObservedRV(
            f"{name}_observed", joint, filled, model=self.root, mask=None
        )
        obs.scale = 1.0
        self.observed_RVs.append(obs)
        self.add_named_variable(obs)
        return free, obs

    # ------------------------------------------------------------- density
    def constrain(self, value_dict):
        """Map unconstrained value dict -> {rv_name: constrained value} env,
        in registration (dependency) order."""
        env = {}
        for rv in self.free_RVs:
            v = value_dict[rv.value_name]
            env[rv.name] = (
                rv.transform.backward(v, env) if rv.transform is not None else v
            )
        return env

    def unconstrain(self, point):
        """Map {rv_name: constrained} -> {value_name: unconstrained}."""
        env = dict(point)
        out = {}
        for rv in self.free_RVs:
            x = point[rv.name]
            out[rv.value_name] = (
                rv.transform.forward(x, env) if rv.transform is not None else x
            )
        return out

    def logp_terms_fn(self, jacobian=True, elementwise=False):
        """Build fn(value_dict) -> {name: per-var summed logp}; with
        elementwise=True the per-variable logps keep their batch shape
        (reference Model.logp sum=False, core.py:612)."""
        free_RVs = list(self.free_RVs)
        observed_RVs = list(self.observed_RVs)
        potentials = list(self.potentials)
        check_bounds = bool(self.check_bounds)

        def fn(value_dict):
            # honor Model(check_bounds=False): the parameter guards read the
            # global flag at TRACE time, and this fn traces under jit here
            # (reference threads model.check_bounds into logp compilation)
            from ..config import config as _config

            prev_check = _config.check_bounds
            _config.check_bounds = check_bounds and prev_check
            try:
                return _fn_body(value_dict)
            finally:
                _config.check_bounds = prev_check

        def _fn_body(value_dict):
            memo = {}
            env = {}
            for extra in (("__minibatch_key__",), ("__simulator_key__",)):
                k_extra = value_dict.get(extra)
                if k_extra is not None:
                    env[extra] = k_extra
            for rv in free_RVs:
                v = value_dict[rv.value_name]
                env[rv.name] = (
                    rv.transform.backward(v, env) if rv.transform is not None else v
                )
            terms = {}
            for rv in free_RVs:
                lp = rv.dist.logp(env[rv.name], env, memo)
                if rv.transform is not None:
                    # a transform whose core block is WIDER than the dist's
                    # event (e.g. ordered over iid Normals) couples those
                    # axes: the per-variable density collapses over them,
                    # matching the jacobian's one-correction-per-block
                    # (reference: Model.logp(sum=False) of a (4,3) ordered
                    # Uniform has shape (4,) with and without jacobian).
                    extra = getattr(rv.transform, "event_ndim", 0) - (
                        rv.dist.event_ndim
                    )
                    for _ in range(max(extra, 0)):
                        if jnp.ndim(lp) > 0:
                            lp = jnp.sum(lp, axis=-1)
                if jacobian and rv.transform is not None:
                    jac = rv.transform.log_jac_det(
                        value_dict[rv.value_name], env
                    )
                    # guard: the correction must now have either the
                    # (collapsed) density's shape or the constrained value's
                    # full shape — anything else (e.g. a keepdims reduction)
                    # would sum a mis-scaled correction silently (reference
                    # guards this with a SpecifyShape assert).
                    jshape = jnp.shape(jac)
                    if jshape != jnp.shape(lp) and jshape != jnp.shape(
                        env[rv.name]
                    ):
                        raise ValueError(
                            f"log_jac_det of {rv.transform!r} on {rv.name!r} "
                            f"has shape {jshape}, expected the density shape "
                            f"{jnp.shape(lp)} or the value shape "
                            f"{jnp.shape(env[rv.name])}"
                        )
                    if elementwise and jshape == jnp.shape(lp):
                        lp = lp + jac
                    elif elementwise:
                        # transform reduces over core dims (e.g. Simplex):
                        # its correction has the batch shape already
                        lp = lp + jnp.reshape(jac, jnp.shape(lp))
                    else:
                        lp = jnp.sum(lp) + jnp.sum(jac)
                terms[rv.name] = lp if elementwise else jnp.sum(lp)
            for orv in observed_RVs:
                val = orv._eval(env, memo)
                lp = orv.dist.logp(val, env, memo)
                if orv.mask is not None:
                    lp = jnp.where(orv.mask, 0.0, lp)
                terms[orv.name] = orv.scale * (
                    lp if elementwise else jnp.sum(lp)
                )
            for pot in potentials:
                pv = evaluate(pot, env, memo)
                terms[pot.name] = pv if elementwise else jnp.sum(pv)
            return terms

        return fn

    def logp_fn(self, jacobian=True, split=False):
        """fn(value_dict) -> scalar joint logp; with split=True returns
        (varlogp, datalogp) for tempering (reference core.py:776-805)."""
        terms_fn = self.logp_terms_fn(jacobian=jacobian)
        free_names = [rv.name for rv in self.free_RVs]
        zero = jnp.zeros((), dtype=floatX())

        if split:
            def fn(value_dict):
                terms = terms_fn(value_dict)
                varlogp = sum(
                    (terms[n] for n in free_names), start=zero
                )
                datalogp = sum(
                    (v for k, v in terms.items() if k not in free_names),
                    start=zero,
                )
                return varlogp, datalogp

            return fn

        def fn(value_dict):
            terms = terms_fn(value_dict)
            return sum(terms.values(), start=zero)

        return fn

    def raveled_info(self, vars=None) -> RaveledInfo:
        rvs = vars if vars is not None else self.continuous_value_vars
        return RaveledInfo.from_rvs(rvs)

    def logp_dlogp_fn(self, jacobian=True):
        """fn(q_flat) -> (logp, grad) over the raveled continuous values —
        the sampler-facing density (reference ValueGradFunction core.py:142).
        One fused XLA program per evaluation."""
        if self.discrete_value_vars:
            fixed_names = [rv.value_name for rv in self.discrete_value_vars]
            raise NotImplementedError(
                f"Gradient-based samplers need continuous free variables only; "
                f"found discrete {fixed_names}. Use pm.sample with compound "
                "step methods."
            )
        info = self.raveled_info()
        scalar_logp = self.logp_fn(jacobian=jacobian)

        def f(q):
            return scalar_logp(unravel_vector(q, info))

        return jax.value_and_grad(f)

    def compile_logp(self, vars=None, jacobian=True, sum=True):
        """Jitted point-dict logp (reference Model.compile_logp); sum=False
        returns {name: elementwise logp} for the requested vars."""
        terms_fn = self.logp_terms_fn(jacobian=jacobian, elementwise=not sum)
        names = None
        if vars is not None:
            vars = [vars] if isinstance(vars, (Node,)) else list(vars)
            names = [v.name if is_node(v) else str(v) for v in vars]

        @jax.jit
        def fn(value_dict):
            terms = terms_fn(value_dict)
            sel = terms if names is None else {n: terms[n] for n in names}
            if sum:
                return functools.reduce(jnp.add, sel.values())
            return sel

        return fn

    def compile_dlogp(self, jacobian=True):
        logp = self.logp_fn(jacobian=jacobian)
        return jax.jit(jax.grad(logp))

    def compile_d2logp(self, jacobian=True, negate_output=False):
        """Jitted dense Hessian of the joint logp over the raveled
        continuous values (reference Model.d2logp/compile_d2logp — which
        returns the NEGATIVE Hessian by default; pass negate_output=True
        for that convention). fn(value_dict) -> (D, D)."""
        info = self.raveled_info()
        scalar_logp = self.logp_fn(jacobian=jacobian)

        def f(q):
            return scalar_logp(unravel_vector(q, info))

        hess = jax.hessian(f)

        @jax.jit
        def fn(value_dict):
            q = ravel_point(value_dict, info)
            h = hess(q)
            return -h if negate_output else h

        return fn

    def tempered_logp_dlogp_fn(self, jacobian=True):
        """fn(q_flat, weight) -> (logp, grad) of the TEMPERED density
        varlogp + weight * (datalogp + potentials) — the SMC/tempering
        ladder (reference ValueGradFunction tempered=True + set_weights,
        model/core.py:176-233). weight is a traced scalar so one compiled
        program serves the whole ladder."""
        info = self.raveled_info()
        split_logp = self.logp_fn(jacobian=jacobian, split=True)

        def f(q, weight):
            varlogp, datalogp = split_logp(unravel_vector(q, info))
            return varlogp + weight * datalogp

        return jax.value_and_grad(f, argnums=0)

    def compile_fn(self, outs, point_fn=True):
        """Compile arbitrary node outputs into a jitted function of a point
        dict in CONSTRAINED space (reference model/core.py:compile_fn)."""
        outs_list = outs if isinstance(outs, (list, tuple)) else [outs]

        @jax.jit
        def fn(point):
            memo = {}
            vals = [evaluate(o, point, memo) for o in outs_list]
            return vals if isinstance(outs, (list, tuple)) else vals[0]

        return fn

    # ------------------------------------------------------- initial points
    def initial_point(self, random_seed=None, jitter=0.0):
        from ..initial_point import make_initial_point

        key = jax.random.PRNGKey(random_seed if random_seed is not None else 0)
        return make_initial_point(self, key, jitter=jitter)

    def check_start_vals(self, start):
        """Raise SamplingError on non-finite initial logp
        (reference core.py:1319)."""
        points = start if isinstance(start, list) else [start]
        terms_fn = jax.jit(self.logp_terms_fn())
        for point in points:
            terms = {k: np.asarray(v) for k, v in terms_fn(point).items()}
            if not all(np.isfinite(v) for v in terms.values()):
                bad = {k: float(v) for k, v in terms.items() if not np.isfinite(v)}
                raise SamplingError(
                    f"Initial evaluation of model at starting point failed!\n"
                    f"Starting values:\n{point}\n\nLogp per variable: {bad}"
                )

    def point_logps(self, point=None, round_vals=2):
        """Per-variable logp at a point (reference core.py:1370)."""
        if point is None:
            point = self.initial_point()
        terms = jax.jit(self.logp_terms_fn())(point)
        return {
            k.replace(f"{self.name}::", ""): round(float(v), round_vals)
            for k, v in terms.items()
        }

    def eval_rv_shapes(self):
        return {rv.name: rv.shape for rv in self.basic_RVs}

    def debug(self, point=None, fn="logp", verbose=False):
        """Lightweight version of reference Model.debug (core.py:1401)."""
        if point is None:
            point = self.initial_point()
        terms = jax.jit(self.logp_terms_fn())(point)
        problems = {k: float(v) for k, v in terms.items() if not np.isfinite(v)}
        if problems:
            print(f"The variable(s) {list(problems)} have non-finite {fn}.")
            if verbose:
                print({k: float(v) for k, v in terms.items()})
        else:
            print("No problems found")
        return problems

    def profile(self, outs=None, n=1000, point=None, trace_dir=None):
        """Time jitted logp and dlogp evaluations (reference core.py:1246
        delegates to the PyTensor profiler; here: wall timing of the compiled
        XLA program, plus an optional jax.profiler device trace).

        trace_dir: if given, the timed loops run under
        ``jax.profiler.trace(trace_dir)`` producing a TensorBoard/Perfetto
        trace of the actual device kernels (XLA op level)."""
        import contextlib
        import time

        if point is None:
            point = self.initial_point()
        prof_cm = (
            jax.profiler.trace(str(trace_dir)) if trace_dir is not None
            else contextlib.nullcontext()
        )
        with prof_cm:
            return self._profile_timed(n, point)

    def _profile_timed(self, n, point):
        import time

        logp = self.compile_logp()
        dlogp = self.compile_dlogp()
        jax.block_until_ready(logp(point))
        t0 = time.perf_counter()
        for _ in range(n):
            out = logp(point)
        jax.block_until_ready(out)
        t_logp = (time.perf_counter() - t0) / n
        jax.block_until_ready(dlogp(point))
        t0 = time.perf_counter()
        for _ in range(n):
            out = dlogp(point)
        jax.tree.map(jax.block_until_ready, out)
        t_dlogp = (time.perf_counter() - t0) / n
        report = {
            "logp_sec_per_call": t_logp,
            "dlogp_sec_per_call": t_dlogp,
            "n_calls": n,
        }
        print(
            f"logp: {t_logp*1e6:.1f} us/call; dlogp: {t_dlogp*1e6:.1f} us/call "
            f"({n} calls)"
        )
        return report

    # ---------------------------------------------------------------- data
    def set_initval(self, rv, value):
        """Set (or clear, with None) the initial value used by samplers for
        a free RV (reference model/core.py set_initval)."""
        name = getattr(rv, "name", str(rv))
        if name not in {r.name for r in self.free_RVs}:
            raise KeyError(f"{name!r} is not a free random variable")
        if value is None:
            self.rvs_to_initial_values.pop(name, None)
        else:
            self.rvs_to_initial_values[name] = value

    def set_data(self, name, values, coords=None):
        """Swap the contents of a pm.Data container (reference core.py:949).
        Shapes are static under XLA: downstream jitted functions re-trace
        automatically on the next call (cache keyed by data version+shape).

        Dim bookkeeping per reference SetUpdateCoords semantics: the new
        value must keep the container's ndim; resizing an axis whose dim has
        coord values requires new ``coords``; resizing a dim DEFINED by an RV
        shape raises; resizing a dim defined by another Data variable warns.
        """
        var = self.named_vars.get(name)
        if not isinstance(var, DataNode):
            raise TypeError(
                f"The variable `{name}` must be a pm.Data container to use set_data."
            )
        values = np.asarray(values)
        old_shape = tuple(var.shape)
        if values.ndim != len(old_shape):
            raise ValueError(
                f"New data for '{name}' must have {len(old_shape)} dimensions, "
                f"got {values.ndim}"
            )
        if coords:
            for k, v in coords.items():
                axis = None
                var_dims = tuple(getattr(var, "dims", None) or ())
                if k in var_dims:
                    axis = var_dims.index(k)
                if axis is not None and len(v) != values.shape[axis]:
                    raise ShapeError(
                        f"Length of new coordinate values for dimension '{k}' "
                        "does not match the new data length",
                        actual=len(v),
                        expected=values.shape[axis],
                    )
        var_dims = tuple(getattr(var, "dims", None) or ())
        for axis, d in enumerate(var_dims):
            if d is None or axis >= values.ndim:
                continue
            new_len = int(values.shape[axis])
            old_len = self._dim_lengths.get(d)
            if old_len is None or new_len == old_len:
                continue
            new_coord = (coords or {}).get(d)
            kind, definer = self.root._dim_definers.get(d, (None, None))
            if kind == "rv":
                raise ShapeError(
                    f"Resizing dimension '{d}' is impossible because the "
                    f"dimension was initialized from '{definer}' and RV "
                    "shapes are static",
                    actual=new_len,
                    expected=old_len,
                )
            if self._coords.get(d) is not None and new_coord is None:
                raise ValueError(
                    f"The '{name}' variable already had {old_len} coord "
                    f"values defined for its {d} dimension. With the new "
                    "data length you must also pass updated coords "
                    f"(reference core.py:949)."
                )
            if kind == "data" and definer != name:
                warnings.warn(
                    f"Resizing dimension '{d}' which was defined by another "
                    f"variable ('{definer}'). Update that variable as well "
                    "to keep shapes coherent.",
                    ShapeWarning,
                )
            self._dim_lengths[d] = new_len
            if new_coord is None and self._coords.get(d) is not None:
                self._coords[d] = None
        var.set_value(values)
        if coords:
            for k, v in coords.items():
                self._coords[k] = tuple(np.asarray(v).tolist())
                self._dim_lengths[k] = len(v)
        self.root._data_version += 1
        self.root._fn_cache.clear()

    def __repr__(self):
        n_free = len(self.free_RVs)
        n_obs = len(self.observed_RVs)
        return f"<pymc_tpu.Model '{self.name}' free={n_free} observed={n_obs}>"

    def to_graphviz(self, **kwargs):
        from ..model_graph import model_to_graphviz

        return model_to_graphviz(self, **kwargs)


def _impute_fill(arr, mask, discrete):
    """Fill masked entries with the observed mean (NOT zero): the masked
    entries still flow through the density before being zeroed out, and an
    out-of-support fill makes that branch's gradient NaN (0 * -inf in the
    where-VJP). The observed mean stays in-support for the imputation-valid
    families."""
    obs = np.asarray(arr)[~mask]
    fill = float(np.mean(obs)) if obs.size else 0.0
    if discrete:
        fill = float(np.round(fill))
    return jnp.asarray(np.where(mask, fill, arr))


from ..distributions.distribution import _gather_batch_param as _gather_param  # noqa: E402


def Deterministic(name, var, model=None, dims=None):
    """Record a named deterministic quantity (reference core.py:2467)."""
    model = modelcontext(model)
    name = model.name_for(name)
    node = var if isinstance(var, DeterministicNode) else as_node(var)
    if not isinstance(node, DeterministicNode):
        node = DeterministicNode(lambda x: jnp.asarray(x), (node,))
    node.name = name
    model.deterministics.append(node)
    model.add_named_variable(node, dims)
    model.root._fn_cache.clear()
    return node


def Potential(name, var, model=None, dims=None):
    """Add an arbitrary logp term (reference core.py:2554)."""
    model = modelcontext(model)
    name = model.name_for(name)
    node = as_node(var)
    node.name = name
    model.potentials.append(node)
    model.add_named_variable(node, dims)
    model.root._fn_cache.clear()
    return node


def Data(name, value, *, dims=None, coords=None, model=None, mutable=None):
    """Named data container (reference pymc/data.py:222)."""
    model = modelcontext(model)
    name = model.name_for(name)
    if isinstance(value, np.ma.MaskedArray) or (
        np.issubdtype(np.asarray(value).dtype, np.floating)
        and np.isnan(np.asarray(value)).any()
    ):
        # missing values belong on `observed=` (imputation), not in a
        # deterministic container (reference data.py determine_coords guard)
        raise NotImplementedError(
            "Masked arrays or arrays with `nan` entries are not supported. "
            "Pass them directly to `observed` if you want to trigger "
            "auto-imputation"
        )
    arr = np.asarray(value)
    if np.issubdtype(arr.dtype, np.floating):
        arr = arr.astype(np.asarray(0, dtype=floatX()).dtype)
    node = DataNode(name, arr, dims=dims, model=model.root)
    if coords:
        model.add_coords(coords)
    if dims is not None:
        dims_t = (dims,) if isinstance(dims, str) else tuple(dims)
        for d, ln in zip(dims_t, arr.shape):
            if d is not None and d not in model._dim_lengths:
                model.add_coord(d, length=ln)
                model.root._dim_definers[d] = ("data", name)
    model.data_vars.append(node)
    model.add_named_variable(node, dims)
    model.root._fn_cache.clear()
    return node


def ConstantData(name, value, *, dims=None, coords=None, model=None, **kwargs):
    """Alias of Data (reference pm.ConstantData)."""
    return Data(name, value, dims=dims, coords=coords, model=model)


def MutableData(name, value, *, dims=None, coords=None, model=None, **kwargs):
    """Alias of Data (reference pm.MutableData; mutability via set_data)."""
    return Data(name, value, dims=dims, coords=coords, model=model)


def set_data(new_data, model=None, coords=None):
    model = modelcontext(model)
    for k, v in new_data.items():
        model.set_data(k, v, coords=coords)


def Point(*args, filter_model_vars=False, model=None, **kwargs):
    """Build a point dict of model variable values (reference core.py:Point).
    With filter_model_vars, drop keys that are not model variables."""
    d = dict(*args, **kwargs)
    if filter_model_vars:
        model = modelcontext(model)
        names = set(model.named_vars) | {
            rv.value_name for rv in model.free_RVs
        }
        d = {k: v for k, v in d.items() if k in names}
    return {k: np.asarray(v) for k, v in d.items()}


# reference class-hierarchy aliases (BaseModel/FrozenModel split is a
# reference implementation detail; freezing here is model_map-based, see
# model/transform/optimization.py freeze_dims_and_data)
BaseModel = Model
FrozenModel = Model


def compile_fn(outs, model=None, point_fn=True):
    model = modelcontext(model)
    return model.compile_fn(outs, point_fn=point_fn)


def compile(inputs, outputs, random_seed=None, mode=None, **kwargs):
    """Compile a positional function of graph inputs to outputs.

    Parity: reference pymc/pytensorf.py:924 `compile` (pytensor.function with
    pymc rewrites). TPU-native: inputs name env slots, the Node graph is
    evaluated under one `jax.jit` — XLA applies every rewrite pass.
    `mode`/extra kwargs are accepted for signature compatibility and ignored.

    Parameters
    ----------
    inputs : list of Nodes (or their string names)
        Positional arguments of the compiled function; each names an env
        entry substituted into the graph.
    outputs : Node or list of Nodes
    """
    from ..graph import Node

    in_names = [i.name if isinstance(i, Node) else str(i) for i in inputs]
    outs_list = outputs if isinstance(outputs, (list, tuple)) else [outputs]

    @jax.jit
    def fn(*args):
        if len(args) != len(in_names):
            raise TypeError(
                f"expected {len(in_names)} arguments, got {len(args)}"
            )
        env = dict(zip(in_names, args))
        memo = {}
        vals = [evaluate(o, env, memo) for o in outs_list]
        return vals if isinstance(outputs, (list, tuple)) else vals[0]

    return fn
