"""Optimizer registry for VI.

Parity: reference pymc/variational/updates.py (Lasagne-derived: sgd:187,
momentum:287, nesterov_momentum:400, adagrad:465, adagrad_window:542 — the
PyMC default, rmsprop:588, adadelta:669, adam:773, adamax:860,
norm_constraint:944, total_norm_constraint:1019). Backed by optax;
adagrad_window is implemented natively (optax has no windowed variant).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

__all__ = [
    "sgd", "momentum", "nesterov_momentum", "adagrad", "adagrad_window",
    "rmsprop", "adadelta", "adam", "adamax", "get_optimizer",
    "norm_constraint", "total_norm_constraint",
]


def sgd(learning_rate=1e-3, **kwargs):
    return optax.sgd(learning_rate)


def momentum(learning_rate=1e-3, momentum=0.9, **kwargs):
    return optax.sgd(learning_rate, momentum=momentum)


def nesterov_momentum(learning_rate=1e-3, momentum=0.9, **kwargs):
    return optax.sgd(learning_rate, momentum=momentum, nesterov=True)


def adagrad(learning_rate=1.0, epsilon=1e-6, **kwargs):
    return optax.adagrad(learning_rate, eps=epsilon)


class _AdagradWindowState(NamedTuple):
    buffer: optax.Params
    step: jax.Array


def adagrad_window(learning_rate=1e-3, epsilon=0.1, n_win=10, **kwargs):
    """PyMC's default VI optimizer (reference updates.py:542): adagrad with
    the accumulator computed over a sliding window of the last n_win
    squared gradients."""

    def init(params):
        buf = jax.tree.map(
            lambda p: jnp.zeros((n_win,) + p.shape, p.dtype), params
        )
        return _AdagradWindowState(buffer=buf, step=jnp.zeros((), jnp.int32))

    def update(grads, state, params=None):
        slot = jnp.mod(state.step, n_win)
        buf = jax.tree.map(
            lambda b, g: b.at[slot].set(g**2), state.buffer, grads
        )
        updates = jax.tree.map(
            lambda g, b: -learning_rate * g
            / (jnp.sqrt(jnp.sum(b, axis=0)) + epsilon),
            grads, buf,
        )
        return updates, _AdagradWindowState(buffer=buf, step=state.step + 1)

    return optax.GradientTransformation(init, update)


def rmsprop(learning_rate=1e-3, rho=0.9, epsilon=1e-6, **kwargs):
    return optax.rmsprop(learning_rate, decay=rho, eps=epsilon)


def adadelta(learning_rate=1.0, rho=0.95, epsilon=1e-6, **kwargs):
    return optax.adadelta(learning_rate, rho=rho, eps=epsilon)


def adam(learning_rate=1e-3, beta1=0.9, beta2=0.999, epsilon=1e-8, **kwargs):
    return optax.adam(learning_rate, b1=beta1, b2=beta2, eps=epsilon)


def adamax(learning_rate=2e-3, beta1=0.9, beta2=0.999, epsilon=1e-8, **kwargs):
    return optax.adamax(learning_rate, b1=beta1, b2=beta2, eps=epsilon)


def norm_constraint(max_norm):
    return optax.clip_by_block_rms(max_norm)


def total_norm_constraint(max_norm):
    return optax.clip_by_global_norm(max_norm)


_REGISTRY = {
    "sgd": sgd,
    "momentum": momentum,
    "nesterov_momentum": nesterov_momentum,
    "adagrad": adagrad,
    "adagrad_window": adagrad_window,
    "rmsprop": rmsprop,
    "adadelta": adadelta,
    "adam": adam,
    "adamax": adamax,
}


def get_optimizer(obj_optimizer=None, default="adagrad_window",
                  default_lr=None):
    if obj_optimizer is None:
        kwargs = {"learning_rate": default_lr} if default_lr else {}
        return _REGISTRY[default](**kwargs)
    if isinstance(obj_optimizer, str):
        return _REGISTRY[obj_optimizer]()
    if isinstance(obj_optimizer, optax.GradientTransformation):
        return obj_optimizer
    if callable(obj_optimizer):
        return obj_optimizer()
    raise TypeError(f"Cannot interpret optimizer {obj_optimizer}")


def apply_momentum(updates=None, params=None, momentum=0.9, **kwargs):
    """Add classical momentum to an optax transformation (reference
    updates.py:apply_momentum, Lasagne-style; here it composes optax
    transforms rather than mutating an update dict)."""
    base = updates if updates is not None else optax.identity()
    return optax.chain(base, optax.trace(decay=momentum, nesterov=False))


def apply_nesterov_momentum(updates=None, params=None, momentum=0.9,
                            **kwargs):
    """Nesterov variant of apply_momentum (reference updates.py)."""
    base = updates if updates is not None else optax.identity()
    return optax.chain(base, optax.trace(decay=momentum, nesterov=True))


__all__ += ["apply_momentum", "apply_nesterov_momentum"]
