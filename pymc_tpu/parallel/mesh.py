"""Device-mesh chain sharding.

TPU-native replacement for the reference's process-per-chain executor
(pymc/sampling/parallel.py, SURVEY.md §2.7): chains are a sharded array axis
on a jax.sharding.Mesh. NUTS transitions are embarrassingly parallel along
chains; cross-chain pooled adaptation and convergence diagnostics introduce
the only collectives (mean/psum over the chain axis), which XLA lowers onto
ICI. Data-sharded logp (§2.14.6) adds a psum over the data axis.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["chain_mesh", "shard_chains", "sharded_sample_step",
           "init_distributed"]


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Initialize the multi-host JAX runtime (the reference's cross-process
    communication is pipes+shm on one host, SURVEY §2.14; cross-host here is
    jax.distributed over DCN). No-op when running single-process."""
    import jax

    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def chain_mesh(n_devices=None, devices=None, axis_name="chains"):
    """1-D mesh over the chain axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def shard_chains(tree, mesh, axis_name="chains"):
    """Place a pytree of (chains, ...) arrays sharded along the chain axis."""

    def put(x):
        spec = P(axis_name, *([None] * (jnp.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def sharded_sample_step(logp_grad_fn, mesh, *, max_treedepth=10, target_accept=0.8,
                        axis_name="chains", pooled_mass=True):
    """Build a jitted, mesh-sharded full warmup step: vmapped NUTS transition
    + dual-averaging update + Welford mass accumulation with optional pooled
    (cross-chain, collective) mass estimation.

    Returns step(keys, q, logp, grad, da, wf, inv_mass, do_update, do_switch)
    -> (q, logp, grad, da, wf, inv_mass, stats). All chain-major arrays are
    sharded along `axis_name`; the pooled mass mean is the cross-device
    collective (rides ICI).
    """
    from ..sampling.adaptation import (
        da_restart,
        da_update,
        welford_init,
        welford_update,
        welford_variance,
    )
    from ..sampling.nuts import nuts_transition_batched

    def vtrans(keys, q, logp, grad, step_size, inv_mass):
        # explicit chain axis: shards along `axis_name` with no vmap tricks;
        # draws are bit-identical to the vmapped scalar kernel
        return nuts_transition_batched(
            logp_grad_fn, keys, q, logp, grad, step_size, inv_mass,
            max_treedepth=max_treedepth, full_mass=False,
        )

    def step(keys, q, logp, grad, da, wf, inv_mass, do_update, do_switch):
        step_size = jnp.exp(da.log_step)
        (q, logp, grad), stats = vtrans(keys, q, logp, grad, step_size, inv_mass)
        accept = jnp.clip(stats.acceptance_rate, 0.0, 1.0)
        da = jax.vmap(lambda d, a: da_update(d, a, target_accept))(da, accept)
        wf_new = jax.vmap(welford_update)(wf, q)
        wf = jax.tree.map(
            lambda new, old: jnp.where(
                jnp.reshape(do_update, (1,) * new.ndim), new, old
            ),
            wf_new, wf,
        )
        new_inv = jax.vmap(welford_variance)(wf)
        if pooled_mass:
            # collective: mean over the sharded chain axis -> all-reduce on ICI
            new_inv = jnp.broadcast_to(
                jnp.mean(new_inv, axis=0, keepdims=True), new_inv.shape
            )
        flag = jnp.reshape(do_switch, (1,) * inv_mass.ndim)
        inv_mass = jnp.where(flag, new_inv, inv_mass)
        wf0 = jax.vmap(lambda _: welford_init(q.shape[1], dtype=q.dtype))(
            jnp.arange(q.shape[0])
        )
        wf = jax.tree.map(
            lambda res, old: jnp.where(
                jnp.reshape(do_switch, (1,) * res.ndim), res, old
            ),
            wf0, wf,
        )
        da_r = jax.vmap(da_restart)(da)
        da = jax.tree.map(
            lambda res, old: jnp.where(
                jnp.reshape(do_switch, (1,) * res.ndim), res, old
            ),
            da_r, da,
        )
        return q, logp, grad, da, wf, inv_mass, stats

    chain_spec = P(axis_name)

    def spec_for(x):
        return NamedSharding(mesh, P(axis_name, *([None] * (x.ndim - 1))))

    return jax.jit(step), spec_for


def data_mesh(n_chain_devices, n_data_devices, devices=None):
    """2-D mesh (chains x data): chains are embarrassingly parallel; the
    data axis shards the observations so each device evaluates its slice of
    the pointwise log-likelihood and XLA inserts the psum for the total
    (SURVEY §2.14.6)."""
    if devices is None:
        devices = jax.devices()
    devices = np.array(devices[: n_chain_devices * n_data_devices])
    return Mesh(
        devices.reshape(n_chain_devices, n_data_devices), ("chains", "data")
    )


class data_sharded:
    """Context manager: while active, observed values and pm.Data contents
    entering a traced logp are constrained to be sharded along `axis` of
    `mesh` (leading array dimension). Use around jit tracing:

        mesh = pm.parallel.data_mesh(2, 4)
        with jax.sharding.use_mesh(mesh), pm.parallel.data_sharded(mesh):
            logp = jax.jit(model.logp_fn())

    Arrays whose leading dimension does not divide the data axis are left
    replicated (e.g. scalars, small side inputs).
    """

    def __init__(self, mesh, axis="data"):
        self.mesh = mesh
        self.axis = axis

    def _hook(self, value):
        ndim = jnp.ndim(value)
        if ndim < 1:
            return value
        n_shards = self.mesh.shape[self.axis]
        if jnp.shape(value)[0] % n_shards != 0:
            return value
        spec = P(self.axis, *([None] * (ndim - 1)))
        return jax.lax.with_sharding_constraint(
            jnp.asarray(value), NamedSharding(self.mesh, spec)
        )

    def __enter__(self):
        from ..graph import _DATA_SHARDING_HOOK

        self._prev = _DATA_SHARDING_HOOK[0]
        _DATA_SHARDING_HOOK[0] = self._hook
        return self

    def __exit__(self, *exc):
        from ..graph import _DATA_SHARDING_HOOK

        _DATA_SHARDING_HOOK[0] = self._prev
        return False


__all__ += ["data_mesh", "data_sharded"]
