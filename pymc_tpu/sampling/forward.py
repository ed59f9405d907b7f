"""Forward sampling: prior and posterior predictive.

Parity: reference pymc/sampling/forward.py (draw:397,
sample_prior_predictive:485, sample_posterior_predictive:607,
compile_forward_sampling_function:262 volatility analysis) and
sampling/deterministic.py:53 (compute_deterministics).

TPU-native: one jitted, draw-vmapped generative pass over the model DAG in
registration order — the volatility analysis reduces to "free RVs present in
the trace are inputs; everything else (missing vars, observed RVs,
deterministics) is (re)computed."
"""

from __future__ import annotations

import logging
import warnings

import numpy as np
import jax
import jax.numpy as jnp

from ..backends.arviz import to_inference_data
from ..graph import DeterministicNode, FreeRV, ObservedRV, evaluate
from ..model.core import modelcontext

__all__ = [
    "sample_prior_predictive",
    "sample_posterior_predictive",
    "compute_deterministics",
    "vectorize_over_posterior",
]

_log = logging.getLogger("pymc_tpu")


def _resolve_key(random_seed):
    if isinstance(random_seed, jax.Array) and random_seed.dtype == jnp.uint32:
        return random_seed
    return jax.random.PRNGKey(
        int(random_seed) if random_seed is not None
        else int(np.random.default_rng().integers(2**30))
    )


def _generative_fn(model, given_names=(), given_det_names=()):
    """Build fn(key, given: dict) -> {name: value} sampling every free RV not
    in `given`, every observed RV, and evaluating deterministics.

    `given_det_names`: deterministics whose value comes from `given` instead
    of being recomputed (reference freeze_vars / non-volatile-copy semantics,
    forward.py:262 volatility analysis). The value is seeded into the
    evaluation memo BY NODE ID so every downstream consumer — including
    observed RV parameters — sees the frozen value."""
    free_RVs = list(model.free_RVs)
    observed_RVs = list(model.observed_RVs)
    deterministics = list(model.deterministics)
    given_names = set(given_names)
    given_det_names = set(given_det_names)

    # draw in REGISTRATION order (model.named_vars is insertion-ordered =
    # topological): an imputed free RV downstream of another imputed RV's
    # combined deterministic must see that RV's observed part already
    # resampled in env, or the combined node memoizes its DATA version
    # (reference samples the generative graph in topological order)
    reg_order = {name: i for i, name in enumerate(model.named_vars)}
    draw_plan = sorted(
        [("free", rv) for rv in free_RVs]
        + [("obs", orv) for orv in observed_RVs],
        key=lambda t: reg_order.get(t[1].name, len(reg_order)),
    )

    def fn(key, given):
        env = dict(given)
        memo = {}
        out = {}
        for det in deterministics:
            if det.name in given_det_names:
                memo[id(det)] = given[det.name]
                env[det.name] = given[det.name]
                out[det.name] = given[det.name]
        for i, (kind, rv) in enumerate(draw_plan, start=1):
            if kind == "free":
                if rv.name in given_names:
                    env[rv.name] = given[rv.name]
                else:
                    env[rv.name] = rv.dist.sample(
                        jax.random.fold_in(key, i), (), env, memo
                    )
                out[rv.name] = env[rv.name]
            else:
                # live shape: `shape=x.shape` on mutable data re-resolves
                # here, so predictions after pm.set_data get the NEW size
                # (reference make_obs_var symbolic-shape semantics)
                shape_node = getattr(rv.dist, "_shape_node", None)
                target = (
                    tuple(shape_node.shape) if shape_node is not None
                    else tuple(rv.shape)
                )
                extra = target[: len(target) - rv.dist.ndim] \
                    if rv.dist.ndim <= len(target) else ()
                draw = rv.dist.sample(jax.random.fold_in(key, i), extra, env, memo)
                out[rv.name] = jnp.broadcast_to(draw, target)
                env[rv.name] = out[rv.name]
        for det in deterministics:
            if det.name not in given_det_names:
                out[det.name] = evaluate(det, env, memo)
        return out

    return fn


def _ancestor_names(node):
    """Names of all named ancestor nodes (free RVs, Data containers, named
    deterministics), excluding the node itself."""
    from ..graph import ancestors

    return {
        a.name
        for a in ancestors([node])
        if a is not node and getattr(a, "name", None) is not None
    }


def _observed_dependent_deterministics(model):
    """Deterministics that depend on an observed RV (the reference's default
    posterior-predictive outputs beyond the observed vars themselves,
    forward.py observed_dependent_deterministics)."""
    out = []
    for det in model.deterministics:
        from ..graph import ancestors

        if any(isinstance(a, ObservedRV) for a in ancestors([det])):
            out.append(det.name)
    return out


def sample_prior_predictive(
    draws=500, model=None, var_names=None, random_seed=None, idata_kwargs=None,
    return_inferencedata=True, compile_kwargs=None, samples=None,
):
    """Reference forward.py:485."""
    model = modelcontext(model)
    if model.potentials:
        warnings.warn(
            "The effect of Potentials on other parameters is ignored during "
            "prior predictive sampling. This is likely to lead to invalid "
            "or biased predictive samples.",
            UserWarning,
        )
    if samples is not None:  # deprecated alias
        draws = samples
    key = _resolve_key(random_seed)
    fn = _generative_fn(model)
    keys = jax.random.split(key, draws)
    out = jax.jit(jax.vmap(lambda k: fn(k, {})))(keys)
    out = {k: np.asarray(jax.device_get(v))[None] for k, v in out.items()}

    obs_names = {orv.name for orv in model.observed_RVs}
    if var_names is not None:
        out = {k: v for k, v in out.items() if k in set(var_names)}
    prior = {k: v for k, v in out.items() if k not in obs_names}
    prior_pred = {k: v for k, v in out.items() if k in obs_names}
    if not return_inferencedata:
        return {k: v[0] for k, v in out.items()}
    return to_inference_data(
        model, prior=prior or None, prior_predictive=prior_pred or None
    )


def sample_posterior_predictive(
    trace, model=None, var_names=None, sample_vars=None, freeze_vars=None,
    random_seed=None, progressbar=True,
    return_inferencedata=True, extend_inferencedata=False, predictions=False,
    idata_kwargs=None, compile_kwargs=None, sample_dims=None,
):
    """Reference forward.py:607 semantics:

    - free RVs present in the posterior are taken from the trace; missing
      free RVs and all observed RVs are resampled (forward.py:262
      volatility analysis);
    - ``sample_vars``: RVs/deterministics to regenerate instead of copying
      from the trace (volatility propagates downstream);
    - ``freeze_vars``: trace variables to keep at their trace values —
      for a deterministic this suppresses recomputation even when its
      inputs changed; for an RV it silences the ImplicitFreezeWarning;
    - trace RVs kept while an ancestor is volatile (resampled, or an
      upstream Data container changed vs the trace's constant_data) warn
      with :class:`~pymc_tpu.exceptions.ImplicitFreezeWarning`;
    - ``var_names`` controls only the output contents; defaults to
      ``sample_vars`` when given, else observed vars plus deterministics
      that depend on them.
    """
    from ..exceptions import ImplicitFreezeWarning

    model = modelcontext(model)
    if model.potentials:
        warnings.warn(
            "The effect of Potentials on other parameters is ignored during "
            "posterior predictive sampling. This is likely to lead to "
            "invalid or biased predictive samples.",
            UserWarning,
        )
    key = _resolve_key(random_seed)

    if isinstance(sample_vars, str):
        sample_vars = [sample_vars]
    if isinstance(freeze_vars, str):
        freeze_vars = [freeze_vars]
    sample_set = set(sample_vars or ())
    freeze_set = set(freeze_vars or ())
    overlap = sample_set & freeze_set
    if overlap:
        raise ValueError(
            f"Variables {sorted(overlap)} cannot be in both sample_vars and "
            "freeze_vars"
        )
    free_names = {rv.name for rv in model.free_RVs}
    det_names = {d.name for d in model.deterministics}
    bad = sorted(sample_set - free_names - det_names)
    if bad:
        raise ValueError(
            f"sample_vars entries {bad} are not random variables or "
            "deterministics of the model"
        )

    post = trace.posterior if hasattr(trace, "posterior") else trace
    if isinstance(post, (list, tuple)):
        # point-list input (reference MultiTrace point lists,
        # test_forward.py:1458): a list of {name: value} dicts becomes a
        # single-chain posterior
        names = set().union(*(p.keys() for p in post)) if post else set()
        post = {
            n: np.stack([np.asarray(p[n]) for p in post])[None]
            for n in names
        }
    traced = {}
    C = D = None
    for rv in model.free_RVs:
        if rv.name in post:
            v = post[rv.name]
            vals = np.asarray(getattr(v, "values", v))
            C, D = vals.shape[:2]
            traced[rv.name] = vals
    if C is None:
        raise ValueError("No free RV draws found in the posterior trace")

    not_in_trace = sorted(
        n for n in freeze_set if n not in post
    )
    if not_in_trace:
        raise ValueError(
            f"freeze_vars {not_in_trace} not present in the trace"
        )

    # ---- volatility analysis (reference forward.py:262) ----
    missing = [rv.name for rv in model.free_RVs if rv.name not in traced]
    changed_data = []
    const_ds = getattr(trace, "constant_data", None)
    if const_ds is not None:
        for dv in model.data_vars:
            if dv.name is None or not hasattr(dv, "get_value"):
                continue
            if dv.name in const_ds:
                old = np.asarray(const_ds[dv.name].values)
                new = np.asarray(jax.device_get(dv.get_value()))
                if old.shape != new.shape or not np.array_equal(old, new):
                    changed_data.append(dv.name)
    seeds = sample_set | set(missing) | set(changed_data)

    # trace RVs kept despite volatile ancestors: implicit freeze + warning
    given_names = [n for n in traced if n not in sample_set]
    if seeds:
        flagged = {}
        for rv in model.free_RVs:
            if rv.name not in given_names or rv.name in freeze_set:
                continue
            hit = _ancestor_names(rv) & seeds
            if hit:
                flagged[rv.name] = sorted(hit)
        if flagged:
            reasons = []
            for name, hit in flagged.items():
                why = []
                if any(h in sample_set or h in missing for h in hit):
                    why.append("an ancestor is resampled")
                if any(h in changed_data for h in hit):
                    why.append("upstream Data/coords changed")
                reasons.append(f"{name} (volatile inputs {hit}: "
                               f"{' and '.join(why)})")
            warnings.warn(
                "These trace variables were implicitly frozen at their "
                f"trace values: {'; '.join(reasons)}. Add them to "
                "sample_vars to resample, or to freeze_vars to silence "
                "this warning.",
                ImplicitFreezeWarning,
                stacklevel=2,
            )

    # deterministics: copy from trace when present and non-volatile (or
    # explicitly frozen); recompute when volatile or in sample_vars
    det_given = []
    for det in model.deterministics:
        n = det.name
        if n not in post or n in sample_set:
            continue
        if n in freeze_set:
            det_given.append(n)
            continue
        if not (_ancestor_names(det) & seeds):
            det_given.append(n)
    if missing:
        _log.info(f"Resampling free RVs not in trace: {missing}")
    fn = _generative_fn(
        model, given_names=given_names, given_det_names=det_given
    )

    flat = {k: jnp.asarray(v.reshape((C * D,) + v.shape[2:]))
            for k, v in traced.items() if k in set(given_names)}
    for n in det_given:
        v = np.asarray(post[n].values)
        flat[n] = jnp.asarray(v.reshape((C * D,) + v.shape[2:]))
    keys = jax.random.split(key, C * D)
    out = jax.jit(jax.vmap(fn))(keys, flat)

    obs_names = [orv.name for orv in model.observed_RVs]
    if var_names is not None:
        want = {var_names} if isinstance(var_names, str) else set(var_names)
    elif sample_set:
        want = set(sample_set)
    else:
        want = set(obs_names) | set(_observed_dependent_deterministics(model))
    result = {}
    for name in want:
        if name not in out:
            raise KeyError(f"Variable {name} not found in model")
        v = np.asarray(jax.device_get(out[name]))
        result[name] = v.reshape((C, D) + v.shape[1:])

    if not return_inferencedata:
        return result
    group = "predictions" if predictions else "posterior_predictive"
    idata = to_inference_data(model, **{
        "posterior_predictive" if not predictions else "posterior_predictive":
        result
    })
    if predictions:
        ds = idata.posterior_predictive
        idata._groups.remove("posterior_predictive")
        idata.add_group("predictions", ds)
    if extend_inferencedata and hasattr(trace, "extend"):
        trace.extend(idata, join="left")
        for g in idata.groups():
            if g not in trace.groups():
                trace.add_group(g, getattr(idata, g))
        return trace
    return idata


def compute_deterministics(
    idata, *, var_names=None, model=None, sample_dims=("chain", "draw"),
    merge_dataset=False, progressbar=True, compile_kwargs=None,
):
    """Recompute deterministics from a posterior (reference
    sampling/deterministic.py:53)."""
    model = modelcontext(model)
    post = idata.posterior if hasattr(idata, "posterior") else idata
    names = [d.name for d in model.deterministics]
    if var_names is not None:
        names = [n for n in names if n in set(var_names)]

    traced = {}
    C = D = None
    for rv in model.free_RVs:
        if rv.name in post:
            vals = np.asarray(post[rv.name].values)
            C, D = vals.shape[:2]
            traced[rv.name] = jnp.asarray(
                vals.reshape((C * D,) + vals.shape[2:])
            )

    dets = [d for d in model.deterministics if d.name in names]

    def fn(env):
        memo = {}
        return {d.name: evaluate(d, env, memo) for d in dets}

    out = jax.jit(jax.vmap(fn))(traced)
    result = {
        k: np.asarray(jax.device_get(v)).reshape((C, D) + v.shape[1:])
        for k, v in out.items()
    }
    from ..backends.arviz import dataset_from_draws

    ds = dataset_from_draws(model, result)
    if merge_dataset and hasattr(idata, "posterior"):
        for k, v in ds.items():
            idata.posterior[k] = v
        return idata.posterior
    return ds


def vectorize_over_posterior(fn=None, idata=None, model=None, *,
                             outputs=None, posterior=None, input_rvs=None,
                             allow_rvs_in_graph=True, random_seed=None):
    """Apply a computation over every posterior draw (reference
    forward.py:1337 vectorize_over_posterior).

    Two call forms:

    - ``vectorize_over_posterior(fn, idata)`` — functional form: fn(env)
      is vmapped over the flattened (chain·draw) posterior.
    - ``vectorize_over_posterior(outputs=[nodes], posterior=ds,
      input_rvs=[rvs], allow_rvs_in_graph=...)`` — reference signature:
      each output expression is evaluated per posterior draw with the
      ``input_rvs`` bound from ``posterior``; any OTHER random variable
      reachable from the outputs is resampled independently per draw when
      ``allow_rvs_in_graph`` (else RuntimeError, matching the reference
      contract). Returns a list of (chains, draws, ...) arrays (concrete —
      the idiomatic JAX equivalent of the reference's symbolic batched
      graph).
    """
    if outputs is not None:
        return _vectorize_outputs_over_posterior(
            outputs, posterior, input_rvs or [], allow_rvs_in_graph,
            random_seed,
        )
    model = modelcontext(model)
    post = idata.posterior
    traced = {}
    C = D = None
    for rv in model.free_RVs:
        if rv.name in post:
            vals = np.asarray(post[rv.name].values)
            C, D = vals.shape[:2]
            traced[rv.name] = jnp.asarray(vals.reshape((C * D,) + vals.shape[2:]))
    out = jax.jit(jax.vmap(fn))(traced)
    return jax.tree.map(
        lambda v: np.asarray(jax.device_get(v)).reshape((C, D) + v.shape[1:]), out
    )


def _vectorize_outputs_over_posterior(outputs, posterior, input_rvs,
                                      allow_rvs_in_graph, random_seed):
    from ..graph import FreeRV, Node, ObservedRV, _parents, evaluate, rv_ancestors

    outputs = [
        o.to_node() if getattr(o, "_lift_to_node", False) else o
        for o in outputs
    ]
    input_rvs = list(input_rvs)
    input_names = {rv.name for rv in input_rvs}

    def _arr(name):
        v = posterior[name]
        return np.asarray(getattr(v, "values", v))

    given = {rv.name: _arr(rv.name) for rv in input_rvs}
    if given:
        C, D = next(iter(given.values())).shape[:2]
    else:
        names = list(getattr(posterior, "data_vars", posterior))
        C, D = _arr(names[0]).shape[:2]

    rvs = rv_ancestors(outputs)
    volatile = [rv for rv in rvs if rv.name not in input_names]
    if volatile and not allow_rvs_in_graph:
        raise RuntimeError(
            "The following random variables found in the extracted graph "
            f"would be resampled: {[rv.name or '<anonymous>' for rv in volatile]} "
            "(pass allow_rvs_in_graph=True or list them in input_rvs)"
        )

    # dependency order over the volatile RVs (reference walks the
    # toposorted graph)
    deps = {
        id(rv): [
            a for a in rv_ancestors(list(_parents(rv))) if a is not rv
        ]
        for rv in volatile
    }
    satisfied = set(input_names)
    order, placed = [], set()
    while len(order) < len(volatile):
        progressed = False
        for rv in volatile:
            if id(rv) in placed:
                continue
            if all(
                id(d) in placed or d.name in satisfied for d in deps[id(rv)]
            ):
                order.append(rv)
                placed.add(id(rv))
                progressed = True
        if not progressed:  # pragma: no cover - DAG by construction
            raise RuntimeError("cyclic RV dependencies")

    def one(k, given_point):
        env = dict(given_point)
        memo = {}
        for i, rv in enumerate(order, start=1):
            env[rv.name] = rv.dist.sample(
                jax.random.fold_in(k, i), (), env, memo
            )
            memo[id(rv)] = env[rv.name]
        return [evaluate(o, env, memo) for o in outputs]

    key = jax.random.PRNGKey(
        int(np.random.default_rng().integers(2**30))
        if random_seed is None else int(random_seed)
    )
    keys = jax.random.split(key, C * D)
    flat = {
        n: jnp.asarray(v.reshape((C * D,) + v.shape[2:]))
        for n, v in given.items()
    }
    outs = jax.jit(jax.vmap(one))(keys, flat)
    return [
        np.asarray(jax.device_get(o)).reshape((C, D) + o.shape[1:])
        for o in outs
    ]


def compile_forward_sampling_function(
    outputs=None, vars_in_trace=None, model=None, **kwargs
):
    """Jitted generative sampler over the model (reference
    forward.py:compile_forward_sampling_function). Returns
    (fn, volatile_names): fn(key, given_dict) draws every requested output;
    free RVs named in `vars_in_trace` are taken from `given_dict`, everything
    else (the volatile set) is resampled.
    """
    model = modelcontext(model)
    given = [getattr(v, "name", str(v)) for v in (vars_in_trace or [])]
    fn = _generative_fn(model, given_names=given)
    volatile = [
        rv.name for rv in model.free_RVs if rv.name not in set(given)
    ] + [orv.name for orv in model.observed_RVs]
    want = (
        [getattr(o, "name", str(o)) for o in outputs]
        if outputs is not None else None
    )

    def sampler(key, given_values=None):
        out = fn(key, dict(given_values or {}))
        if want is not None:
            out = {k: v for k, v in out.items() if k in set(want)}
        return out

    return jax.jit(sampler), volatile
