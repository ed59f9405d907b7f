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
from ..exceptions import ImputationWarning, SamplingError, ShapeError
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


class Model:
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
        self.parent = model if model is not None else Model.get_context(False)
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
            "_dim_lengths", "_data_version", "_fn_cache",
        ):
            root = self.__dict__.get("_root")
            if root is not None and root is not self:
                return getattr(root, attr)
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
        if values is not None:
            values = np.asarray(values)
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
        """Resize a dimension (reference core.py:894). Static-shape semantics:
        downstream compiled functions re-trace on next call."""
        if coord_values is not None and len(coord_values) != new_length:
            raise ShapeError("coord_values length mismatch", len(coord_values), new_length)
        self._dim_lengths[name] = int(new_length)
        self._coords[name] = (
            np.asarray(coord_values) if coord_values is not None else None
        )
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

    def __getitem__(self, key):
        return self.named_vars[key]

    def __contains__(self, key):
        return key in self.named_vars

    def add_named_variable(self, var, dims=None):
        if var.name is None:
            raise ValueError("Variable is unnamed")
        if var.name in self.named_vars:
            raise ValueError(f"Variable name {var.name} already exists.")
        self.named_vars[var.name] = var
        if dims is not None:
            var.dims = (dims,) if isinstance(dims, str) else tuple(dims)
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
        # register any new dims implied
        if dims is not None:
            for d, ln in zip(dims, dist.shape):
                if d is not None and d not in self._dim_lengths:
                    self.add_coord(d, length=ln)

        if observed is not None:
            return self._make_obs_var(dist, name, observed, dims, total_size)

        # resolve transform: explicit `transform` wins; then default_transform;
        # then the dist's own default (reference create_value_var :2085).
        # transform=None explicitly disables the transform.
        if transform is UNSET:
            if default_transform is UNSET:
                tr = dist.default_transform()
            else:
                tr = default_transform
        else:
            tr = transform
        if tr is False:
            tr = None
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
        if dist.event_ndim > 0:
            raise NotImplementedError(
                "Automatic imputation is only supported for univariate "
                "distributions (matches reference restriction)."
            )
        mask = np.isnan(arr)
        n_missing = int(mask.sum())
        missing_idx = np.nonzero(mask.ravel())[0]
        filled = jnp.asarray(np.where(mask, 0.0, arr))

        # free RV over the missing slots; its params are the dist params
        # gathered at the missing positions (broadcast over the value batch,
        # keeping per-param event dims). Reconstruction is BY NAME: several
        # dists' stored param order differs from their constructor's
        # positional order (NegativeBinomial stores (n, p) but its ctor is
        # (mu, alpha, p, n); BetaBinomial stores (n, alpha, beta) vs ctor
        # (alpha, beta, n)) — positional reconstruction scrambled those.
        pe = dist.param_event_ndims or (0,) * len(dist.param_names)
        gathered_kwargs = {
            pname: _gather_param(p, arr.shape, missing_idx, e)
            for pname, p, e in zip(dist.param_names, dist.param_values(), pe)
            if p is not None
        }
        gathered = type(dist).dist(shape=(n_missing,), **gathered_kwargs)
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

        def _combine(f, flat_obs):
            out = jnp.ravel(flat_obs)
            out = out.at[missing_idx].set(f)
            return out.reshape(arr.shape)

        combined = DeterministicNode(_combine, (free, filled), name=name)
        self.deterministics.append(combined)
        self.add_named_variable(combined, dims)
        self.root._fn_cache.clear()
        return combined

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

        def fn(value_dict):
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
        automatically on the next call (cache keyed by data version+shape)."""
        var = self.named_vars.get(name)
        if not isinstance(var, DataNode):
            raise TypeError(
                f"The variable `{name}` must be a pm.Data container to use set_data."
            )
        var.set_value(np.asarray(values))
        if coords:
            for k, v in coords.items():
                self._coords[k] = np.asarray(v)
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


def _gather_param(p, shape, idx, event_ndim=0):
    """Broadcast a dist param over the VALUE batch `shape` (keeping its own
    trailing event dims, e.g. Categorical p / Ordered cutpoints) and gather
    the flat missing indices (imputation)."""
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
