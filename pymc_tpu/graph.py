"""Lazy symbolic graph over pure-JAX operations.

This replaces the reference's dependence on PyTensor symbolic tensors
(reference layer 1-2: pymc/pytensorf.py, ARCHITECTURE.md:27-33). Instead of an
open-ended rewrite system, a model is a small static DAG of `Node` objects
whose evaluation is plain JAX — so `model.logp` traces to ONE fused XLA
program and `jax.grad`/`jax.vmap`/`jax.jit` compose for free. Shape/dtype are
inferred eagerly at construction via `jax.eval_shape` (static shapes are what
XLA:TPU wants).

Node kinds:
  - ConstantNode: wraps a concrete array.
  - DataNode: named mutable-by-recompile constant (pm.Data equivalent).
  - FreeRV: a latent random variable; evaluates to its (constrained) value
    looked up in the evaluation environment.
  - ObservedRV: an observed random variable; evaluates to its data.
  - DeterministicNode: fn(*parents) for any traceable fn.

`evaluate(node, env)` resolves a node given `env: {rv_name: value}` with
memoization, entirely inside a JAX trace.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "Node",
    "ConstantNode",
    "DataNode",
    "FreeRV",
    "ObservedRV",
    "DeterministicNode",
    "as_node",
    "is_node",
    "evaluate",
    "apply",
    "ancestors",
    "free_rv_ancestors",
    "rv_ancestors",
]


def is_node(x) -> bool:
    return isinstance(x, Node)


def as_node(x) -> "Node":
    """Wrap a concrete value in a ConstantNode (identity on Nodes)."""
    if isinstance(x, Node):
        return x
    return ConstantNode(x)


# bumped by DataNode.set_value: stale-shape detection for eager shape caches
_DATA_VERSION = [0]

# set by pymc_tpu.parallel.data_sharded(...): a callable(array) -> sharded
# array (with_sharding_constraint along the data axis), applied to observed
# and pm.Data values as they enter a traced logp. XLA GSPMD then partitions
# the pointwise likelihood across devices and inserts the psum for the
# reduction (SURVEY §2.14.6 data-axis parallelism).
_DATA_SHARDING_HOOK = [None]


def _apply_data_sharding(value):
    hook = _DATA_SHARDING_HOOK[0]
    if hook is None:
        return value
    return hook(value)


def _aval(x):
    """ShapeDtypeStruct for a node or concrete value."""
    if isinstance(x, Node):
        return jax.ShapeDtypeStruct(x.shape, x.dtype)
    x = jnp.asarray(x) if not hasattr(x, "shape") else x
    return jax.ShapeDtypeStruct(np.shape(x), jnp.asarray(x).dtype)


def evaluate(x, env=None, memo=None):
    """Evaluate a Node (or pass through a concrete value) under `env`.

    env maps free/observed RV names to their CONSTRAINED values. memo is an
    id-keyed cache shared across a single model-function evaluation so common
    subexpressions are traced once.
    """
    if not isinstance(x, Node):
        return x
    if memo is None:
        memo = {}
    return x._eval(env if env is not None else {}, memo)


def apply(fn, *args, **kwargs):
    """Apply `fn` symbolically if any argument is a Node, else eagerly.

    kwargs must be static (non-Node). Unnamed Distribution operands lift to
    anonymous FreeRV nodes (Distribution.to_node) so expressions over
    ``.dist()`` objects build measurable graphs like the reference's
    RandomVariable vars.
    """
    if any(getattr(a, "_lift_to_node", False) for a in args):
        args = tuple(
            a.to_node() if getattr(a, "_lift_to_node", False) else a
            for a in args
        )
    if any(isinstance(a, Node) for a in args) or any(
        isinstance(v, Node) for v in kwargs.values()
    ):
        return DeterministicNode(fn, args, kwargs)
    return fn(*args, **kwargs)


class Node:
    """Abstract lazy value. Subclasses set .shape, .dtype at construction."""

    __array_ufunc__ = None  # make numpy defer to our reflected operators
    __array_priority__ = 1000

    shape: tuple
    dtype: object
    name: str | None = None

    def _eval(self, env, memo):
        key = id(self)
        if key in memo:
            return memo[key]
        out = self._compute(env, memo)
        memo[key] = out
        return out

    def _compute(self, env, memo):  # pragma: no cover - abstract
        raise NotImplementedError

    # -- ndarray-ish protocol ------------------------------------------------
    @property
    def ndim(self):
        return len(self.shape)

    @property
    def size(self):
        return int(np.prod(self.shape)) if self.shape else 1

    @property
    def T(self):
        return apply(jnp.transpose, self)

    def eval(self, env=None, point=None):
        """Eagerly evaluate this node (user-facing debugging helper).

        `point` may supply values for free RVs by name (constrained space).
        """
        e = dict(env or {})
        if point:
            e.update(point)
        return evaluate(self, e)

    def astype(self, dtype):
        fn = lambda x: jnp.asarray(x).astype(dtype)  # noqa: E731
        # measurable-cast marker (distributions/transformed.py _match_cast,
        # reference logprob/tensor.py find_measurable_casts)
        fn._measurable_cast = np.dtype(dtype)
        return apply(fn, self)

    def reshape(self, *shape):
        if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        fn = lambda x: jnp.reshape(x, shape)  # noqa: E731
        # C-order index bijection: measurable-layout marker
        # (distributions/transformed.py LayoutDistribution)
        fn._measurable_layout = ("reshape", None)
        return apply(fn, self)

    def ravel(self):
        return apply(jnp.ravel, self)

    def flatten(self):
        return apply(jnp.ravel, self)

    def squeeze(self, axis=None):
        fn = lambda x: jnp.squeeze(x, axis=axis)  # noqa: E731
        fn._measurable_layout = ("reshape", None)
        return apply(fn, self)

    def transpose(self, *axes):
        ax = axes if axes else None
        if len(axes) == 1 and isinstance(axes[0], (tuple, list)):
            ax = tuple(axes[0])
        fn = lambda x: jnp.transpose(x, ax)  # noqa: E731
        fn._measurable_layout = ("transpose", ax)
        return apply(fn, self)

    def sum(self, axis=None, keepdims=False):
        fn = lambda x: jnp.sum(x, axis=axis, keepdims=keepdims)  # noqa: E731
        fn._measurable_reduction = ("sum", axis, keepdims)
        return apply(fn, self)

    def prod(self, axis=None, keepdims=False):
        return apply(lambda x: jnp.prod(x, axis=axis, keepdims=keepdims), self)

    def mean(self, axis=None, keepdims=False):
        return apply(lambda x: jnp.mean(x, axis=axis, keepdims=keepdims), self)

    def std(self, axis=None, keepdims=False):
        return apply(lambda x: jnp.std(x, axis=axis, keepdims=keepdims), self)

    def var(self, axis=None, keepdims=False):
        return apply(lambda x: jnp.var(x, axis=axis, keepdims=keepdims), self)

    def max(self, axis=None, keepdims=False):
        fn = lambda x: jnp.max(x, axis=axis, keepdims=keepdims)  # noqa: E731
        fn._measurable_reduction = ("max", axis, keepdims)
        return apply(fn, self)

    def min(self, axis=None, keepdims=False):
        fn = lambda x: jnp.min(x, axis=axis, keepdims=keepdims)  # noqa: E731
        fn._measurable_reduction = ("min", axis, keepdims)
        return apply(fn, self)

    def cumsum(self, axis=None):
        return apply(lambda x: jnp.cumsum(x, axis=axis), self)

    def dot(self, other):
        return apply(jnp.dot, self, other)

    def __len__(self):
        if not self.shape:
            raise TypeError("len() of unsized Node")
        return self.shape[0]

    def __iter__(self):
        if not self.shape:
            raise TypeError("iteration over a 0-d Node")
        return (self[i] for i in range(self.shape[0]))

    def __getitem__(self, idx):
        if isinstance(idx, Node) or (
            isinstance(idx, tuple) and any(isinstance(i, Node) for i in idx)
        ):
            if isinstance(idx, tuple):
                fn = lambda x, *ix: x[tuple(ix)]  # noqa: E731
                fn._measurable_index = None  # random index: no marginal
                return apply(fn, self, *idx)
            fn = lambda x, ix: x[ix]  # noqa: E731
            fn._measurable_index = None
            return apply(fn, self, idx)
        fn = lambda x: x[idx]  # noqa: E731
        # static basic index: measurable selection marker
        # (distributions/transformed.py SelectionDistribution)
        fn._measurable_index = (idx,)
        return apply(fn, self)

    # -- arithmetic ----------------------------------------------------------
    @staticmethod
    def _operand_ok(o):
        """Defer (NotImplemented) for foreign types with their own operator
        overloads (e.g. gp.cov.Covariance)."""
        import numbers

        return isinstance(o, (Node, numbers.Number, np.ndarray, list, tuple)) or (
            hasattr(o, "shape") and hasattr(o, "dtype")
        )

    def __add__(self, o):
        if not self._operand_ok(o):
            return NotImplemented
        return apply(jnp.add, self, o)

    def __radd__(self, o):
        return apply(jnp.add, o, self)

    def __sub__(self, o):
        if not self._operand_ok(o):
            return NotImplemented
        return apply(jnp.subtract, self, o)

    def __rsub__(self, o):
        return apply(jnp.subtract, o, self)

    def __mul__(self, o):
        if not self._operand_ok(o):
            return NotImplemented
        return apply(jnp.multiply, self, o)

    def __rmul__(self, o):
        return apply(jnp.multiply, o, self)

    def __truediv__(self, o):
        return apply(jnp.divide, self, o)

    def __rtruediv__(self, o):
        return apply(jnp.divide, o, self)

    def __floordiv__(self, o):
        return apply(jnp.floor_divide, self, o)

    def __rfloordiv__(self, o):
        return apply(jnp.floor_divide, o, self)

    def __mod__(self, o):
        return apply(jnp.mod, self, o)

    def __rmod__(self, o):
        return apply(jnp.mod, o, self)

    def __pow__(self, o):
        return apply(jnp.power, self, o)

    def __rpow__(self, o):
        return apply(jnp.power, o, self)

    def __matmul__(self, o):
        return apply(jnp.matmul, self, o)

    def __rmatmul__(self, o):
        return apply(jnp.matmul, o, self)

    def __neg__(self):
        return apply(jnp.negative, self)

    def __pos__(self):
        return self

    def __abs__(self):
        return apply(jnp.abs, self)

    def __invert__(self):
        return apply(jnp.logical_not, self)

    # comparisons build symbolic masks; identity/hash stay id-based
    def __lt__(self, o):
        return apply(jnp.less, self, o)

    def __le__(self, o):
        return apply(jnp.less_equal, self, o)

    def __gt__(self, o):
        return apply(jnp.greater, self, o)

    def __ge__(self, o):
        return apply(jnp.greater_equal, self, o)

    def __eq__(self, o):  # noqa: D105
        if o is self:
            return True
        return apply(jnp.equal, self, o)

    def __ne__(self, o):
        if o is self:
            return False
        return apply(jnp.not_equal, self, o)

    def __hash__(self):
        return id(self)

    def __and__(self, o):
        return apply(jnp.logical_and, self, o)

    def __or__(self, o):
        return apply(jnp.logical_or, self, o)

    def __repr__(self):
        nm = f" '{self.name}'" if self.name else ""
        return f"<{type(self).__name__}{nm} shape={self.shape} dtype={jnp.dtype(self.dtype).name}>"

    def __str__(self):
        return self.name if self.name else repr(self)

    def __bool__(self):
        raise TypeError(
            f"The truth value of a symbolic {type(self).__name__} is undefined. "
            "Use pymc_tpu.math.switch / jnp.where for branching on node values."
        )


class ConstantNode(Node):
    def __init__(self, value, name=None):
        self.value = jnp.asarray(value)
        self.shape = tuple(self.value.shape)
        self.dtype = self.value.dtype
        self.name = name

    def _compute(self, env, memo):
        return self.value


class LiveShape(tuple):
    """A shape tuple that remembers the DataNode it came from.

    Behaves exactly like the frozen tuple of ints everywhere, but lets
    `shape=x.shape` (the reference's mutable-data idiom, pymc docs
    "Prediction" pattern) stay live: consumers that care (Distribution
    shape specs) keep `owner` and re-resolve after pm.set_data resizes
    the container."""

    owner = None

    def __new__(cls, vals, owner=None):
        obj = super().__new__(cls, vals)
        obj.owner = owner
        return obj


class DataNode(Node):
    """Named data container (pm.Data). Evaluation checks the env first so the
    value can be overridden (set_data swaps the stored array and bumps the
    owning model's data version to re-key jit caches; see model/core.py).

    Parity: reference pymc/data.py:222 (pm.Data shared variable).
    """

    def __init__(self, name, value, dims=None, model=None):
        self.name = name
        self.dims = dims
        self._value = jnp.asarray(value)
        self.dtype = self._value.dtype
        self.model = model

    @property
    def shape(self):
        return LiveShape(self._value.shape, owner=self)

    def set_value(self, value):
        value = jnp.asarray(value)
        if tuple(value.shape) != tuple(self._value.shape):
            _DATA_VERSION[0] += 1
        self._value = value
        self.dtype = value.dtype

    def get_value(self):
        return self._value

    def _compute(self, env, memo):
        return _apply_data_sharding(
            env.get(("__data__", self.name), self._value)
        )


class FreeRV(Node):
    """A latent random variable node.

    Evaluates to env[name] — its CONSTRAINED value. Carries its Distribution,
    value-space transform and static shape. Equivalent of the reference's
    free RV + value-variable pairing (pymc/model/core.py:1907 register_rv,
    :2085 create_value_var).
    """

    def __init__(self, name, dist, shape, dtype, transform=None, model=None):
        self.name = name
        self.dist = dist
        self.shape = tuple(shape)
        self.dtype = dtype
        self.transform = transform
        self.model = model

    @property
    def value_name(self):
        if self.transform is None:
            return self.name
        return f"{self.name}_{self.transform.name}__"

    @property
    def value_shape(self):
        if self.transform is None:
            return self.shape
        return tuple(self.transform.value_shape(self.shape))

    def _compute(self, env, memo):
        try:
            return env[self.name]
        except KeyError:
            raise KeyError(
                f"No value provided for free random variable '{self.name}'. "
                f"env keys: {[k for k in env if isinstance(k, str)]}"
            ) from None


class ObservedRV(Node):
    """An observed random variable; evaluates to its (constant) data, unless
    overridden through the env (used by posterior-predictive resampling).

    Parity: pymc/model/core.py:1984 make_obs_var.
    """

    def __init__(self, name, dist, observed, model=None, mask=None):
        self.name = name
        self.dist = dist
        self.observed = observed
        if isinstance(observed, Node):
            # symbolic observed data (e.g. a Minibatch view)
            self.shape = tuple(observed.shape)
            self.dtype = observed.dtype
        else:
            self.shape = tuple(np.shape(observed))
            self.dtype = jnp.asarray(observed).dtype
        self.model = model
        self.mask = mask  # boolean mask of MISSING entries (imputation)

    def _compute(self, env, memo):
        if self.name in env:
            return env[self.name]
        if isinstance(self.observed, Node):
            return _apply_data_sharding(self.observed._eval(env, memo))
        return _apply_data_sharding(self.observed)


class DeterministicNode(Node):
    """fn(*args, **kwargs) where any arg may be a Node.

    Shapes are eager (jax.eval_shape at construction) but version-stamped:
    pm.set_data can RESIZE a DataNode ancestor, so `.shape` recomputes
    whenever any data container changed since the cached inference."""

    def __init__(self, fn, args, kwargs=None, name=None):
        self.fn = fn
        self.args = tuple(args)
        self.kwargs = dict(kwargs or {})
        self.name = name
        node_kw = {k: v for k, v in self.kwargs.items() if isinstance(v, Node)}
        if node_kw:
            raise TypeError("Node-valued kwargs are not supported; pass positionally.")
        self._infer_shape()

    def _infer_shape(self):
        # only Node args become abstract values; everything else stays a
        # static closure constant — ops like swapaxes/take need their int
        # axis arguments concrete at trace time
        node_idx = [i for i, a in enumerate(self.args) if isinstance(a, Node)]
        avals = [_aval(self.args[i]) for i in node_idx]

        def shell(*xs):
            full = list(self.args)
            for i, x in zip(node_idx, xs):
                full[i] = x
            return self.fn(*full, **self.kwargs)

        out = jax.eval_shape(shell, *avals)
        if not isinstance(out, jax.ShapeDtypeStruct):
            raise TypeError(
                f"Deterministic fn must return a single array, got {type(out)}"
            )
        self._shape = tuple(out.shape)
        self.dtype = out.dtype
        self._shape_version = _DATA_VERSION[0]

    @property
    def shape(self):
        if self._shape_version != _DATA_VERSION[0]:
            self._infer_shape()
        # live: `shape=expr.shape` on a data-derived expression re-resolves
        # after pm.set_data resizes an ancestor (same contract as
        # DataNode.shape — reference mutable-data prediction pattern)
        return LiveShape(self._shape, owner=self)

    def _compute(self, env, memo):
        args = [a._eval(env, memo) if isinstance(a, Node) else a for a in self.args]
        return self.fn(*args, **self.kwargs)


def _parents(node):
    if isinstance(node, DeterministicNode):
        return [a for a in node.args if isinstance(a, Node)]
    if isinstance(node, (FreeRV, ObservedRV)):
        dist = node.dist
        out = [p for p in dist.param_values() if isinstance(p, Node)] if dist else []
        return out
    return []


def ancestors(nodes):
    """All transitive ancestor Nodes (including the inputs), deduped, DFS order."""
    seen = {}
    stack = [n for n in nodes if isinstance(n, Node)]
    while stack:
        n = stack.pop()
        if id(n) in seen:
            continue
        seen[id(n)] = n
        stack.extend(_parents(n))
    return list(seen.values())


def free_rv_ancestors(nodes):
    return [n for n in ancestors(nodes) if isinstance(n, FreeRV)]


def rv_ancestors(nodes):
    return [n for n in ancestors(nodes) if isinstance(n, (FreeRV, ObservedRV))]
