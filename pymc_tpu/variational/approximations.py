"""Variational approximation families.

Parity: reference pymc/variational/approximations.py (MeanFieldGroup:41
(mu, rho -> softplus sigma), FullRankGroup:118 (packed L),
EmpiricalGroup:191 particle histogram; wrappers MeanField:354, FullRank:361,
Empirical:368) and opvi.py:1237 (Approximation sampling machinery).

TPU-native: every family is a pytree of parameters over the model's flat
unconstrained space; sampling/logq/entropy are pure JAX. `sample()` returns
InferenceData through the same postprocess path as MCMC.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..blocking import unravel_vector
from ..config import floatX

__all__ = ["Approximation", "MeanField", "FullRank", "Empirical", "VIState"]

_LOG_2PI = 1.8378770664093453


class VIState(NamedTuple):
    """Fitted-state snapshot (reference opvi.py:122 VIState): per-variable
    mean/std DataArrays in CONSTRAINED space (std is None for families
    without a density, e.g. Empirical)."""

    mean: dict
    std: dict | None


class Approximation:
    """Base: fitted posterior approximation over the flat space."""

    def __init__(self, model, info, params):
        self.model = model
        self.info = info
        self.params = params
        self.hist = np.asarray([])

    # subclass API ---------------------------------------------------------
    @classmethod
    def init_params(cls, D, start=None, start_sigma=None):
        raise NotImplementedError

    @staticmethod
    def sample_q(params, key, n):
        """(n, D) draws from q."""
        raise NotImplementedError

    @staticmethod
    def entropy(params):
        raise NotImplementedError

    @staticmethod
    def logq(params, z):
        raise NotImplementedError

    # common ----------------------------------------------------------------
    @property
    def ndim(self):
        return self.info.total_size

    def mean_dict(self):
        mu = self._mean_flat()
        return unravel_vector(mu, self.info)

    def sample(self, draws=1000, random_seed=None, return_inferencedata=True,
               model=None, **kwargs):
        """Draw from the approximation -> InferenceData (reference
        Approximation.sample). The posterior is post-processed against
        ``model`` / the active model context when given — the reference's
        ``with remove_minibatched_nodes(model): approx.sample()`` idiom,
        where deterministics re-evaluate over the FULL data."""
        from ..model.core import Model
        from ..sampling.mcmc import _make_postprocess_fn, _resolve_seed
        from ..backends.arviz import to_inference_data

        target = model or Model.get_context(False) or self.model
        key = _resolve_seed(random_seed)
        z = self.sample_q(self.params, key, draws)  # (draws, D)
        post_fn = jax.jit(jax.vmap(_make_postprocess_fn(target, self.info)))
        out = post_fn(z)
        posterior = {
            k: np.asarray(jax.device_get(v))[None]
            for k, v in out.items()
        }
        if not return_inferencedata:
            return posterior
        return to_inference_data(target, posterior=posterior)

    def sample_dict_fn(self, draws=1):
        def fn(key):
            z = self.sample_q(self.params, key, draws)
            return jax.vmap(lambda q: unravel_vector(q, self.info))(z)

        return fn

    # -- expression sampling (reference opvi.py Approximation.sample_node /
    # symbolic_sample_over_posterior) --------------------------------------
    def _constrain_env(self, z_flat):
        """flat unconstrained vector -> {rv_name: constrained value} env."""
        vals = unravel_vector(z_flat, self.info)
        env = {}
        for rv in self.model.free_RVs:
            v = vals[rv.value_name]
            env[rv.name] = (
                rv.transform.backward(v, env) if rv.transform is not None else v
            )
        return env

    def sample_node(self, node, size=None, deterministic=False,
                    more_replacements=None, random_seed=None):
        """Evaluate a model expression under the approximation (reference
        opvi.py Approximation.sample_node): free RVs reachable from ``node``
        are replaced by draws from q — or by the posterior mean when
        ``deterministic`` is truthy. With ``size=k`` the result gains a
        leading (k,) axis of independent draws; without it, one draw is
        returned at the expression's own shape. ``more_replacements`` maps
        graph Nodes to replacement values (evaluated in their place — the
        reference's more_replacements; use it to swap pm.Data / minibatch
        views for new arrays). Each unseeded call uses fresh randomness."""
        from ..graph import Node, as_node, evaluate
        from ..sampling.mcmc import _resolve_seed

        node = node if isinstance(node, Node) else as_node(node)
        repl = {}
        if more_replacements:
            for k, v in more_replacements.items():
                repl[id(k)] = jnp.asarray(v)

        def eval_at(z):
            memo = dict(repl)
            env = self._constrain_env(z)
            return evaluate(node, env, memo)

        if deterministic:
            out = eval_at(self._mean_flat())
            if size is not None:
                out = jnp.broadcast_to(
                    out[None], (int(size),) + tuple(np.shape(out))
                )
            return out
        if random_seed is not None:
            key = _resolve_seed(random_seed)
        else:
            if not hasattr(self, "_node_key"):
                self._node_key = _resolve_seed(None)
                self._node_calls = 0
            self._node_calls += 1
            key = jax.random.fold_in(self._node_key, self._node_calls)
        n = 1 if size is None else int(size)
        z = self.sample_q(self.params, key, n)
        out = jax.vmap(eval_at)(z)
        return out[0] if size is None else out

    # -- named fitted-state views (reference opvi.py:1184-1229) ------------
    def _std_flat(self):
        raise NotImplementedError(
            f"{type(self).__name__} approximation has no parametric std"
        )

    def _named_data(self, flat):
        """flat value-space vector -> {value_name: DataVar} with model
        dims/coords where the value var shares the RV's shape (reference
        mean_data/std_data: keyed by TRANSFORMED names, e.g. sigma_log__)."""
        from ..backends.inference_data import DataVar

        vals = unravel_vector(flat, self.info)
        out = {}
        coords_map = getattr(self.model, "coords", None) or {}
        for name, shape in zip(self.info.names, self.info.shapes):
            arr = np.asarray(jax.device_get(vals[name]))
            dims, coords = self._dims_coords(name, arr.shape, coords_map)
            out[name] = DataVar(name, arr, dims=dims, coords=coords)
        return out

    def _dims_coords(self, name, shape, coords_map):
        from ..backends.arviz import _var_dims

        dims = list(_var_dims(self.model, name, shape))
        if all(d.startswith(f"{name}_dim_") for d in dims) and dims:
            # transformed value name: borrow the RV's dims when the value
            # shape matches the constrained shape (elementwise transforms)
            for rv in self.model.free_RVs:
                if rv.value_name == name and rv.name != name:
                    rv_dims = list(_var_dims(self.model, rv.name, shape))
                    if tuple(getattr(rv, "value_shape", ())) == tuple(
                        getattr(rv, "shape", ())
                    ):
                        dims = [
                            d.replace(rv.name, name) if d.startswith(f"{rv.name}_dim_")
                            else d
                            for d in rv_dims
                        ]
                    break
        coords = {
            d: list(coords_map[d])
            for d in dims
            if d in coords_map and coords_map[d] is not None
        }
        return tuple(dims), coords

    @property
    def mean_data(self):
        """Per-variable posterior means in the VALUE (transformed) space
        as DataArrays (reference opvi.py:1184)."""
        return self._named_data(self._mean_flat())

    @property
    def std_data(self):
        """Per-variable posterior stds in the VALUE space (reference
        opvi.py:1193). NotImplementedError for density-free families."""
        return self._named_data(self._std_flat())

    include_transformed = False

    @property
    def state(self):
        """VIState(mean, std) in CONSTRAINED space (reference opvi.py state:
        the mean/std vectors are mapped through the value transforms —
        for monotone transforms the mean entry is the posterior median).
        std is None for families without a parametric std (Empirical)."""
        from ..backends.inference_data import DataVar

        coords_map = getattr(self.model, "coords", None) or {}

        def constrained(flat):
            env = self._constrain_env(flat)
            out = {}
            for rv in self.model.free_RVs:
                arr = np.asarray(jax.device_get(env[rv.name]))
                dims, coords = self._dims_coords(rv.name, arr.shape, coords_map)
                out[rv.name] = DataVar(rv.name, arr, dims=dims, coords=coords)
            return out

        mean = constrained(self._mean_flat())
        try:
            std = constrained(self._std_flat())
        except NotImplementedError:
            std = None
        if self.include_transformed:
            extra = self._named_data(self._mean_flat())
            for k, v in extra.items():
                mean.setdefault(k, v)
            if std is not None:
                for k, v in self._named_data(self._std_flat()).items():
                    std.setdefault(k, v)
        return VIState(mean=mean, std=std)


class MeanField(Approximation):
    """Diagonal Gaussian over the unconstrained space
    (reference MeanFieldGroup:41)."""

    name = "mean_field"

    @classmethod
    def init_params(cls, D, start=None, start_sigma=None):
        mu = jnp.zeros((D,), floatX()) if start is None else jnp.asarray(start, floatX())
        sigma0 = 0.1 if start_sigma is None else start_sigma
        rho = jnp.full((D,), _softplus_inv(sigma0), floatX())
        if start_sigma is not None and not np.isscalar(start_sigma):
            rho = _softplus_inv(jnp.asarray(start_sigma, floatX()))
        return {"mu": mu, "rho": rho}

    @staticmethod
    def sample_q(params, key, n):
        D = params["mu"].shape[0]
        eps = jax.random.normal(key, (n, D), dtype=floatX())
        sigma = jax.nn.softplus(params["rho"])
        return params["mu"] + sigma * eps

    @staticmethod
    def entropy(params):
        sigma = jax.nn.softplus(params["rho"])
        D = sigma.shape[0]
        return jnp.sum(jnp.log(sigma)) + 0.5 * D * (1.0 + _LOG_2PI)

    @staticmethod
    def logq(params, z):
        sigma = jax.nn.softplus(params["rho"])
        return jnp.sum(
            -0.5 * ((z - params["mu"]) / sigma) ** 2
            - jnp.log(sigma) - 0.5 * _LOG_2PI,
            axis=-1,
        )

    def _mean_flat(self):
        return self.params["mu"]

    def _std_flat(self):
        return jax.nn.softplus(self.params["rho"])

    @property
    def mean(self):
        return unravel_vector(self.params["mu"], self.info)

    @property
    def std(self):
        return unravel_vector(jax.nn.softplus(self.params["rho"]), self.info)


class FullRank(Approximation):
    """Full-covariance Gaussian: L packed lower-triangular with softplus diag
    (reference FullRankGroup:118)."""

    name = "full_rank"

    @classmethod
    def init_params(cls, D, start=None, start_sigma=None):
        mu = jnp.zeros((D,), floatX()) if start is None else jnp.asarray(start, floatX())
        rows, cols = np.tril_indices(D)
        packed = jnp.zeros((D * (D + 1) // 2,), floatX())
        diag_idx = np.cumsum(np.arange(1, D + 1)) - 1
        packed = packed.at[diag_idx].set(_softplus_inv(0.1))
        return {"mu": mu, "L_packed": packed}

    @staticmethod
    def _chol(params):
        D = params["mu"].shape[0]
        rows, cols = np.tril_indices(D)
        L = jnp.zeros((D, D), floatX()).at[rows, cols].set(params["L_packed"])
        diag = jax.nn.softplus(jnp.diagonal(L))
        return L - jnp.diagonal(L) * jnp.eye(D, dtype=floatX()) + jnp.eye(
            D, dtype=floatX()
        ) * diag

    @staticmethod
    def sample_q(params, key, n):
        D = params["mu"].shape[0]
        L = FullRank._chol(params)
        eps = jax.random.normal(key, (n, D), dtype=floatX())
        return params["mu"] + eps @ L.T

    @staticmethod
    def entropy(params):
        L = FullRank._chol(params)
        D = L.shape[0]
        return jnp.sum(jnp.log(jnp.diagonal(L))) + 0.5 * D * (1.0 + _LOG_2PI)

    @staticmethod
    def logq(params, z):
        from jax.scipy.linalg import solve_triangular

        L = FullRank._chol(params)
        D = L.shape[0]
        diff = z - params["mu"]
        w = solve_triangular(L, diff.T, lower=True).T
        return (
            -0.5 * jnp.sum(w**2, axis=-1)
            - jnp.sum(jnp.log(jnp.diagonal(L)))
            - 0.5 * D * _LOG_2PI
        )

    def _mean_flat(self):
        return self.params["mu"]

    def _std_flat(self):
        L = self._chol(self.params)
        return jnp.sqrt(jnp.sum(L * L, axis=1))

    @property
    def mean(self):
        return unravel_vector(self.params["mu"], self.info)

    @property
    def cov(self):
        L = self._chol(self.params)
        return L @ L.T


class Empirical(Approximation):
    """Particle histogram (reference EmpiricalGroup:191; the SVGD family).

    Public construction from a trace (reference approximations.py:368
    ``Empirical(trace)``): the posterior draws become the particle set, in
    the unconstrained space, so ``.sample()`` resamples the trace and the
    approximation composes with the rest of the VI machinery."""

    name = "empirical"

    def __init__(self, trace=None, info=None, params=None, model=None,
                 size=None, random_seed=None):
        if info is not None and params is not None:
            # internal path (SVGD/ASVGD): positional (model, info, params)
            super().__init__(trace, info, params)
            return
        from ..blocking import ravel_point
        from ..model.core import modelcontext

        model = modelcontext(model)
        info_ = model.raveled_info()
        names = [rv.name for rv in model.free_RVs]

        posterior = getattr(trace, "posterior", None)
        if posterior is not None:
            arrs = {
                n: np.asarray(posterior[n].values) for n in names
            }  # (chains, draws, *shape)
            n_particles = next(iter(arrs.values())).shape[0] * next(
                iter(arrs.values())
            ).shape[1]
            batched = {
                n: jnp.asarray(a.reshape((n_particles,) + a.shape[2:]))
                for n, a in arrs.items()
            }
        else:  # MultiTrace-like: get_values per var
            arrs = {n: np.asarray(trace.get_values(n)) for n in names}
            n_particles = next(iter(arrs.values())).shape[0]
            batched = {n: jnp.asarray(a) for n, a in arrs.items()}

        def _flat(point):
            return ravel_point(model.unconstrain(point), info_)

        particles = jax.vmap(_flat)(batched)
        if size is not None and size < n_particles:
            key = jax.random.PRNGKey(0 if random_seed is None else random_seed)
            idx = jax.random.choice(key, n_particles, (size,), replace=False)
            particles = particles[idx]
        super().__init__(model, info_, {"particles": particles})

    @classmethod
    def init_params(cls, D, start=None, start_sigma=None, n_particles=100,
                    key=None, jitter=1.0):
        if start is None:
            start = jnp.zeros((D,), floatX())
        key = key if key is not None else jax.random.PRNGKey(0)
        noise = jitter * jax.random.normal(key, (n_particles, D), dtype=floatX())
        return {"particles": jnp.asarray(start, floatX()) + noise}

    @staticmethod
    def sample_q(params, key, n):
        P = params["particles"].shape[0]
        idx = jax.random.randint(key, (n,), 0, P)
        return params["particles"][idx]

    @staticmethod
    def entropy(params):
        return jnp.zeros((), floatX())

    @staticmethod
    def logq(params, z):
        raise NotImplementedError("Empirical approximation has no density")

    def _mean_flat(self):
        return jnp.mean(self.params["particles"], axis=0)

    @property
    def mean(self):
        return unravel_vector(self._mean_flat(), self.info)


class Blocked(Approximation):
    """Heterogeneous per-subset approximation: each group of latent variables
    gets its own family over its slice of the flat space (reference
    opvi.py:582 Group + :1237 Approximation over multiple groups).

    Build a concrete class with `Blocked.make(families, indices, D)`; its
    params pytree is {"g0": <family0 params>, "g1": ...} so one optax
    optimizer updates all groups jointly in the single ELBO program.
    """

    name = "blocked"
    _families: tuple = ()
    _indices: tuple = ()
    _D: int = 0

    @classmethod
    def make(cls, families, indices, D):
        idx = tuple(np.asarray(i, dtype=np.int32) for i in indices)
        cover = np.concatenate(idx) if idx else np.zeros(0, np.int32)
        if len(np.unique(cover)) != cover.size:
            raise ValueError("groups overlap: each latent belongs to one group")
        if cover.size != D:
            raise ValueError(
                f"groups cover {cover.size} of {D} latent dimensions; add a "
                "Group(None) rest group"
            )
        return type(
            "Blocked",
            (cls,),
            {"_families": tuple(families), "_indices": idx, "_D": int(D)},
        )

    @classmethod
    def init_params(cls, D, start=None, start_sigma=None, group_kwargs=None):
        group_kwargs = group_kwargs or [{}] * len(cls._families)
        params = {}
        for j, (fam, idx, kw) in enumerate(
            zip(cls._families, cls._indices, group_kwargs)
        ):
            s = None if start is None else jnp.asarray(start)[idx]
            params[f"g{j}"] = fam.init_params(len(idx), start=s, **kw)
        return params

    @classmethod
    def sample_q(cls, params, key, n):
        z = jnp.zeros((n, cls._D), floatX())
        for j, (fam, idx) in enumerate(zip(cls._families, cls._indices)):
            zj = fam.sample_q(params[f"g{j}"], jax.random.fold_in(key, j), n)
            z = z.at[:, idx].set(zj)
        return z

    @classmethod
    def entropy(cls, params):
        return sum(
            fam.entropy(params[f"g{j}"])
            for j, fam in enumerate(cls._families)
        )

    @classmethod
    def logq(cls, params, z):
        return sum(
            fam.logq(params[f"g{j}"], z[..., idx])
            for j, (fam, idx) in enumerate(zip(cls._families, cls._indices))
        )

    def _mean_flat(self):
        mu = jnp.zeros((self._D,), floatX())
        for j, (fam, idx) in enumerate(zip(self._families, self._indices)):
            mu = mu.at[idx].set(fam.mean_of(self.params[f"g{j}"]))
        return mu

    @property
    def mean(self):
        return unravel_vector(self._mean_flat(), self.info)

    def group_of(self, j):
        """The j-th sub-approximation as its own family instance (sharing
        this object's fitted params)."""
        fam, idx = self._families[j], self._indices[j]
        sub = object.__new__(fam)
        sub.model, sub.info, sub.hist = self.model, None, np.asarray([])
        sub.params = self.params[f"g{j}"]
        return sub


def _mean_of_mu(params):
    return params["mu"]


MeanField.mean_of = staticmethod(_mean_of_mu)
FullRank.mean_of = staticmethod(_mean_of_mu)
Empirical.mean_of = staticmethod(
    lambda params: jnp.mean(params["particles"], axis=0)
)

__all__.append("Blocked")


def _softplus_inv(x):
    return float(np.log(np.expm1(x))) if np.isscalar(x) else jnp.log(
        jnp.expm1(x)
    )
