"""Conversion of sampler output to InferenceData.

Parity: reference pymc/backends/arviz.py (DataTreeConverter:283,
to_inference_data:613) — groups posterior / sample_stats / log_likelihood /
observed_data / constant_data with model dims & coords attached.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..graph import DataNode, evaluate
from .inference_data import DataVar, Dataset, InferenceData

__all__ = ["to_inference_data", "dataset_from_draws"]


def _var_dims(model, name, trailing_shape):
    """Resolve named dims for a variable's trailing axes."""
    var = model.named_vars.get(name)
    dims = getattr(var, "dims", None) if var is not None else None
    out = []
    for i, s in enumerate(trailing_shape):
        if dims is not None and i < len(dims) and dims[i] is not None:
            out.append(dims[i])
        else:
            out.append(f"{name}_dim_{i}")
    return tuple(out)


def _coords(model):
    coords = {}
    for k, v in model.coords.items():
        if v is not None:
            coords[k] = np.asarray(v)
    return coords


def dataset_from_draws(model, draws, coords=None, sample_dims=("chain", "draw")):
    """draws: {name: (chain, draw, *shape) np array} -> Dataset."""
    coords = dict(coords or {})
    variables = {}
    for name, arr in draws.items():
        arr = np.asarray(arr)
        dims = tuple(sample_dims) + _var_dims(model, name, arr.shape[len(sample_dims):])
        variables[name] = DataVar(name, arr, dims, coords)
    return Dataset(variables, coords)


def to_inference_data(
    model,
    posterior=None,
    sample_stats=None,
    warmup_groups=None,
    prior=None,
    prior_predictive=None,
    posterior_predictive=None,
    attrs=None,
    include_log_likelihood=False,
):
    """Assemble the InferenceData (reference to_inference_data:613)."""
    coords = _coords(model)
    idata = InferenceData()

    if posterior is not None:
        ds = dataset_from_draws(model, posterior, coords)
        ds.attrs.update(attrs or {})
        idata.add_group("posterior", ds)

    if sample_stats is not None:
        vs = {
            k: DataVar(k, np.asarray(v), ("chain", "draw"), coords)
            for k, v in sample_stats.items()
        }
        ds = Dataset(vs, coords)
        ds.attrs.update(attrs or {})
        idata.add_group("sample_stats", ds)

    for gname, draws in (warmup_groups or {}).items():
        if gname.endswith("sample_stats"):
            vs = {
                k: DataVar(k, np.asarray(v), ("chain", "draw"), coords)
                for k, v in draws.items()
            }
            idata.add_group(gname, Dataset(vs, coords))
        else:
            idata.add_group(gname, dataset_from_draws(model, draws, coords))

    if prior is not None:
        idata.add_group("prior", dataset_from_draws(model, prior, coords))
    if prior_predictive is not None:
        idata.add_group(
            "prior_predictive", dataset_from_draws(model, prior_predictive, coords)
        )
    if posterior_predictive is not None:
        idata.add_group(
            "posterior_predictive",
            dataset_from_draws(model, posterior_predictive, coords),
        )

    # observed / constant data
    obs = {}
    for orv in model.observed_RVs:
        arr = np.asarray(jax.device_get(orv.observed))
        obs[orv.name] = DataVar(
            orv.name, arr, _var_dims(model, orv.name, arr.shape), coords
        )
    if obs:
        idata.add_group("observed_data", Dataset(obs, coords))

    const = {}
    for dv in model.data_vars:
        if hasattr(dv, "get_value"):
            arr = np.asarray(jax.device_get(dv.get_value()))
        elif hasattr(dv, "value"):
            arr = np.asarray(jax.device_get(dv.value))
        else:  # e.g. MinibatchIndexNode: no constant payload
            continue
        if dv.name is None:
            continue
        const[dv.name] = DataVar(
            dv.name, arr, _var_dims(model, dv.name, arr.shape), coords
        )
    if const:
        idata.add_group("constant_data", Dataset(const, coords))

    if include_log_likelihood and posterior is not None:
        from ..stats.log_density import compute_log_likelihood

        compute_log_likelihood(idata, model=model, extend_inferencedata=True)

    return idata


def predictions_to_inference_data(
    predictions, posterior_trace=None, model=None, coords=None, dims=None,
    idata_orig=None, inplace=False,
):
    """Wrap out-of-sample prediction draws into an InferenceData
    `predictions` group (reference backends/__init__.py re-export of the
    arviz converter). `predictions`: {name: (chain, draw, ...) array}."""
    from ..model.core import modelcontext
    from .inference_data import InferenceData

    model = modelcontext(model)
    ds = dataset_from_draws(model, {
        k: np.asarray(v) for k, v in predictions.items()
    })
    if idata_orig is not None:
        idata = idata_orig if inplace else _copy_idata(idata_orig)
    else:
        idata = InferenceData()
    idata.add_group("predictions", ds)
    return idata


def _copy_idata(idata):
    from .inference_data import InferenceData

    out = InferenceData()
    for g in idata.groups():
        out.add_group(g, getattr(idata, g))
    return out
