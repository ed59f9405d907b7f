"""Standard zarr v2 directory-store trace.

Parity: reference pymc/backends/zarr.py:279 (ZarrTrace): a persistent,
externally-readable store with posterior / sample_stats / warmup groups and
a `_sampling_state` group, chunked along draws, enabling crash-durable
sampling and resume (wired into sampling/mcmc.py:1549-1583 there).

zarr-the-package is unavailable in this environment, but zarr v2's
directory format is plain JSON metadata (`.zgroup`/`.zarray`/`.zattrs`)
plus raw C-order binary chunk files — written here directly, through the
async C++ writer thread (cc/trace_writer.cc) when available so the device
loop never blocks on file IO. Arrays carry xarray's `_ARRAY_DIMENSIONS`
attribute, so `xarray.open_zarr(path / "posterior")` works out of the box.

TPU-native split: during sampling the hot path appends only the FLAT
unconstrained draws (`unconstrained_posterior/q`, (chain, draw, D)) and
per-draw sampler stats — one contiguous binary stream per chunk, no
per-variable unpacking on the sampling thread. The named, constrained
`posterior` group is written once at finalization from the already
postprocessed draws (`write_inference_data`).
"""

from __future__ import annotations

import json
import math
import os
import shutil

import numpy as np
import jax

__all__ = ["ZarrDirStore", "ZarrTrace"]


_DTYPE_MAP = {
    "float64": "<f8", "float32": "<f4", "float16": "<f2",
    "int64": "<i8", "int32": "<i4", "int16": "<i2", "int8": "|i1",
    "uint64": "<u8", "uint32": "<u4", "uint8": "|u1",
    "bool": "|b1",
}


def _zarr_dtype(dtype):
    name = np.dtype(dtype).name
    if name not in _DTYPE_MAP:
        raise TypeError(f"unsupported zarr dtype {name}")
    return _DTYPE_MAP[name]


def _fill_for(dtype):
    kind = np.dtype(dtype).kind
    if kind == "b":
        return False
    if kind in "iu":
        return 0
    return 0.0


class ZarrDirStore:
    """Minimal zarr v2 directory store: groups, uncompressed arrays with
    uniform chunks (edge chunks padded, shape clips), JSON attrs. Readable
    by any zarr v2 implementation."""

    def __init__(self, path, writer=None):
        self.path = str(path)
        os.makedirs(self.path, exist_ok=True)
        self._writer = writer
        # JSON written by THIS process is served from memory: with the async
        # writer a read-back from disk could race the background persist
        self._json_cache = {}
        self._write_json(".zgroup", {"zarr_format": 2})

    # ------------------------------------------------------------- plumbing
    def _abs(self, rel):
        return os.path.join(self.path, rel)

    def _write_json(self, rel, obj):
        target = self._abs(rel)
        os.makedirs(os.path.dirname(target) or self.path, exist_ok=True)
        payload = json.dumps(obj, indent=1).encode()
        self._json_cache[rel] = obj
        if self._writer is not None:
            self._writer.write_bytes(target, payload)
        else:
            tmp = target + ".tmp"
            with open(tmp, "wb") as f:
                f.write(payload)
            os.replace(tmp, target)

    def _read_json(self, rel):
        if rel in self._json_cache:
            return self._json_cache[rel]
        p = self._abs(rel)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def flush(self):
        if self._writer is not None:
            self._writer.flush()

    # -------------------------------------------------------------- groups
    def create_group(self, name):
        os.makedirs(self._abs(name), exist_ok=True)
        self._write_json(os.path.join(name, ".zgroup"), {"zarr_format": 2})

    def write_attrs(self, group, attrs):
        rel = os.path.join(group, ".zattrs") if group else ".zattrs"
        self._write_json(rel, attrs)

    def read_attrs(self, group):
        rel = os.path.join(group, ".zattrs") if group else ".zattrs"
        return self._read_json(rel) or {}

    # -------------------------------------------------------------- arrays
    def create_array(self, name, shape, chunks, dtype, dim_names=None,
                     attrs=None):
        os.makedirs(self._abs(name), exist_ok=True)
        meta = {
            "chunks": [int(c) for c in chunks],
            "compressor": None,
            "dtype": _zarr_dtype(dtype),
            "fill_value": _fill_for(dtype),
            "filters": None,
            "order": "C",
            "shape": [int(s) for s in shape],
            "zarr_format": 2,
        }
        self._write_json(os.path.join(name, ".zarray"), meta)
        a = dict(attrs or {})
        if dim_names is not None:
            a["_ARRAY_DIMENSIONS"] = list(dim_names)
        if a:
            self._write_json(os.path.join(name, ".zattrs"), a)

    def array_meta(self, name):
        return self._read_json(os.path.join(name, ".zarray"))

    def resize(self, name, shape):
        meta = self.array_meta(name)
        meta["shape"] = [int(s) for s in shape]
        self._write_json(os.path.join(name, ".zarray"), meta)

    def write_chunk(self, name, idx, block, chunks=None, dtype=None):
        """Write one chunk block (padded to the full chunk shape)."""
        meta = None
        if chunks is None or dtype is None:
            meta = self.array_meta(name)
            chunks = meta["chunks"]
            dtype = np.dtype(meta["dtype"])
        block = np.asarray(block, dtype=dtype)
        if tuple(block.shape) != tuple(chunks):
            pad = np.zeros(tuple(chunks), dtype=dtype)
            pad[tuple(slice(0, s) for s in block.shape)] = block
            block = pad
        key = ".".join(str(i) for i in idx)
        target = self._abs(os.path.join(name, key))
        payload = np.ascontiguousarray(block).tobytes()
        if self._writer is not None:
            self._writer.write_bytes(target, payload)
        else:
            tmp = target + ".tmp"
            with open(tmp, "wb") as f:
                f.write(payload)
            os.replace(tmp, target)

    def read_chunk(self, name, idx):
        meta = self.array_meta(name)
        key = ".".join(str(i) for i in idx)
        p = self._abs(os.path.join(name, key))
        chunks = tuple(meta["chunks"])
        dtype = np.dtype(meta["dtype"])
        if not os.path.exists(p):
            return np.full(chunks, meta["fill_value"], dtype=dtype)
        raw = np.fromfile(p, dtype=dtype)
        return raw.reshape(chunks)

    def read_array(self, name):
        self.flush()
        meta = self.array_meta(name)
        if meta is None:
            return None
        shape = tuple(meta["shape"])
        chunks = tuple(meta["chunks"])
        grid = tuple(
            max(1, math.ceil(s / c)) for s, c in zip(shape, chunks)
        )
        out = np.zeros(
            tuple(g * c for g, c in zip(grid, chunks)),
            dtype=np.dtype(meta["dtype"]),
        )
        for idx in np.ndindex(*grid):
            block = self.read_chunk(name, idx)
            sl = tuple(
                slice(i * c, (i + 1) * c) for i, c in zip(idx, chunks)
            )
            out[sl] = block
        return out[tuple(slice(0, s) for s in shape)]

    def write_array(self, name, arr, dim_names=None, chunk_draws=None,
                    attrs=None):
        """Create + write a whole array (chunked along axis 1 when
        chunk_draws is given — the (chain, draw, ...) convention)."""
        arr = np.asarray(arr)
        if chunk_draws is None:
            chunks = arr.shape if arr.ndim else (1,)
            a = arr.reshape(chunks)
            self.create_array(name, a.shape, chunks, a.dtype,
                              dim_names=dim_names, attrs=attrs)
            self.write_chunk(name, (0,) * a.ndim, a)
            return
        cd = min(chunk_draws, max(arr.shape[1], 1))
        chunks = (arr.shape[0], cd) + arr.shape[2:]
        self.create_array(name, arr.shape, chunks, arr.dtype,
                          dim_names=dim_names, attrs=attrs)
        n = math.ceil(arr.shape[1] / cd) if arr.shape[1] else 0
        for k in range(n):
            block = arr[:, k * cd:(k + 1) * cd]
            idx = (0, k) + (0,) * (arr.ndim - 2)
            self.write_chunk(name, idx, block)


class ZarrTrace:
    """Durable zarr-v2 trace with the FileTrace duck interface
    (write_chunk/save_state/write_meta/read_draws/load_state), so
    ``pm.sample(trace=ZarrTrace(path), resume=True)`` streams draws into a
    standard zarr store with identical resume semantics.

    Store layout (reference backends/zarr.py:67-279 group structure):
      /.zattrs                      run metadata (draws_done, tune, ...)
      /unconstrained_posterior/q    (chain, draw, D) flat draws
      /sample_stats/<stat>          (chain, draw)
      /_sampling_state/leaf_<i>     sampler carry pytree leaves (+treedef)
      /posterior/<var>              (chain, draw, ...) — written at
                                    finalization via write_inference_data
      /warmup_posterior, /warmup_sample_stats — likewise at finalization
    """

    def __init__(self, path, overwrite=False, draws_per_chunk=100,
                 use_native_writer=True):
        self.path = str(path)
        if overwrite and os.path.isdir(self.path):
            shutil.rmtree(self.path)
        self._writer = None
        if use_native_writer:
            from .native_writer import AsyncChunkWriter

            w = AsyncChunkWriter()
            self._writer = w if w.available else None
        self.store = ZarrDirStore(self.path, writer=self._writer)
        self.draws_per_chunk = int(draws_per_chunk)
        self._q_buf = None        # (S_pending, C, D) draws-major buffer
        self._stats_buf = {}
        self._complete = 0        # draws already in FULL chunks on disk
        self._created = False
        self._errors_seen = 0
        # multi-controller chain-shard layout (set_chain_layout): this
        # process owns chains [offset, offset + local) of total
        self._chain_offset = 0
        self._chains_local = None
        self._chains_total = None
        meta = self.read_meta()
        if meta and meta.get("draws_done", 0) > 0:
            self._load_pending_from_disk(meta)

    def set_chain_layout(self, offset, total, local):
        """Multi-controller mode (SURVEY §2.14.8): every process streams its
        own chain block into ONE shared store. The chain axis is chunked at
        `local` chains, so each controller writes disjoint chunk files —
        the shared-store replacement for the reference's per-chain draw
        pipes (pymc/sampling/parallel.py). Requires offset % local == 0
        (a 1-D chain mesh gives every process one contiguous equal block)."""
        offset, total, local = int(offset), int(total), int(local)
        if local <= 0 or total % local or offset % local:
            raise ValueError(
                f"chain layout must tile evenly: offset={offset}, "
                f"total={total}, local={local}"
            )
        self._chain_offset = offset
        self._chains_total = total
        self._chains_local = local
        meta = self.read_meta()
        if meta and meta.get("draws_done", 0) > 0:
            # re-buffer THIS shard's trailing partial chunk
            self._q_buf = None
            self._stats_buf = {}
            self._complete = 0
            self._load_pending_from_disk(meta)

    # --------------------------------------------------------------- meta
    def write_meta(self, meta):
        attrs = self.store.read_attrs("")
        attrs.update(meta)
        self.store.write_attrs("", attrs)

    def read_meta(self):
        attrs = self.store.read_attrs("")
        return attrs or None

    # ------------------------------------------------------------- resume
    def _load_pending_from_disk(self, meta):
        """Re-buffer the trailing partial chunk so appends stay aligned to
        the uniform chunk grid."""
        q = self.store.read_array("unconstrained_posterior/q")
        if q is None:
            return
        self._created = True
        lo = self._chain_offset
        hi = None if self._chains_local is None else lo + self._chains_local
        S = q.shape[1]
        cd = self.draws_per_chunk
        self._complete = (S // cd) * cd
        if S > self._complete:
            self._q_buf = np.ascontiguousarray(
                q[lo:hi, self._complete:].transpose(1, 0, 2)
            )
            for name in self._stat_names():
                arr = self.store.read_array(f"sample_stats/{name}")
                self._stats_buf[name] = np.ascontiguousarray(
                    arr[lo:hi, self._complete:].T
                )

    def _stat_names(self):
        root = os.path.join(self.path, "sample_stats")
        if not os.path.isdir(root):
            return []
        return sorted(
            d for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d))
        )

    # ------------------------------------------------------------- writes
    def write_chunk(self, q_draws, stats):
        """q_draws (S, C, D); stats dict of (S, C) arrays (the mcmc driver's
        chunk shapes). Buffers into uniform zarr chunks along the draw axis."""
        q = np.asarray(jax.device_get(q_draws))
        stats = {k: np.asarray(jax.device_get(v)) for k, v in stats.items()}
        S, C, D = q.shape
        if self._chains_local is not None and C != self._chains_local:
            raise ValueError(
                f"chunk carries {C} chains but this process's shard is "
                f"{self._chains_local} (set_chain_layout)"
            )
        CT = self._chains_total or C
        if not self._created:
            cd = self.draws_per_chunk
            self.store.create_group("unconstrained_posterior")
            self.store.create_array(
                "unconstrained_posterior/q", (CT, 0, D), (C, cd, D), q.dtype,
                dim_names=["chain", "draw", "flat_dim"],
            )
            self.store.create_group("sample_stats")
            for k, v in stats.items():
                self.store.create_array(
                    f"sample_stats/{k}", (CT, 0), (C, cd), v.dtype,
                    dim_names=["chain", "draw"],
                )
            self._created = True
        self._q_buf = (
            q if self._q_buf is None
            else np.concatenate([self._q_buf, q], axis=0)
        )
        for k, v in stats.items():
            prev = self._stats_buf.get(k)
            self._stats_buf[k] = (
                v if prev is None else np.concatenate([prev, v], axis=0)
            )
        self._emit(final=False)

    def _emit(self, final):
        """Write buffered draws as zarr chunks: full chunks always, the
        trailing partial chunk only on final/flush (it will be rewritten if
        more draws arrive)."""
        if self._q_buf is None:
            return
        cd = self.draws_per_chunk
        pending = self._q_buf.shape[0]
        n_full = pending // cd
        emit_draws = pending if final else n_full * cd
        if emit_draws == 0 and not final:
            return
        C = self._q_buf.shape[1]
        CT = self._chains_total or C
        grid_c = (self._chain_offset // C) if self._chains_local else 0
        total = self._complete + pending
        # chunk-major blocks from the buffer
        for k in range(math.ceil(emit_draws / cd) if emit_draws else 0):
            lo, hi = k * cd, min((k + 1) * cd, pending)
            grid_k = self._complete // cd + k
            block = self._q_buf[lo:hi].transpose(1, 0, 2)  # (C, s, D)
            self.store.write_chunk(
                "unconstrained_posterior/q", (grid_c, grid_k, 0), block
            )
            for name, v in self._stats_buf.items():
                self.store.write_chunk(
                    f"sample_stats/{name}", (grid_c, grid_k), v[lo:hi].T
                )
        D = self._q_buf.shape[2]
        self.store.resize("unconstrained_posterior/q", (CT, total, D))
        for name in self._stats_buf:
            self.store.resize(f"sample_stats/{name}", (CT, total))
        # drop fully persisted draws from the buffer (the trailing partial
        # chunk stays buffered: it is rewritten in place if more draws come)
        keep_from = n_full * cd
        self._complete += keep_from
        if keep_from:
            if keep_from >= pending:
                self._q_buf = None
                self._stats_buf = {}
            else:
                self._q_buf = np.ascontiguousarray(self._q_buf[keep_from:])
                self._stats_buf = {
                    name: np.ascontiguousarray(v[keep_from:])
                    for name, v in self._stats_buf.items()
                }

    def flush(self):
        self._emit(final=True)
        self.store.flush()
        if self._writer is not None:
            errs = self._writer.errors
            if errs > self._errors_seen:
                n_new = errs - self._errors_seen
                self._errors_seen = errs
                raise IOError(
                    f"ZarrTrace background writer failed to persist {n_new} "
                    f"file(s) in {self.path} (disk full / bad path?)"
                )

    def close(self):
        self.flush()

    # ------------------------------------------------------ sampler state
    def _state_group(self):
        if self._chains_local is not None:
            return f"_sampling_state/shard_{self._chain_offset}"
        return "_sampling_state"

    @staticmethod
    def _leaf_to_host(leaf):
        """Device leaf -> host numpy; under a multi-controller mesh only the
        local chain shards are addressable, so persist exactly those (chain
        axis leads every chain-sharded carry leaf)."""
        if getattr(leaf, "is_fully_addressable", True):
            return np.asarray(jax.device_get(leaf))
        if leaf.ndim == 0 or getattr(leaf, "is_fully_replicated", False):
            return np.asarray(jax.device_get(leaf.addressable_shards[0].data))
        by_start = {}
        for s in leaf.addressable_shards:
            by_start.setdefault(s.index[0].start or 0, s)
        return np.concatenate(
            [np.asarray(jax.device_get(by_start[k].data))
             for k in sorted(by_start)], axis=0,
        )

    def save_state(self, carry):
        leaves, treedef = jax.tree.flatten(carry)
        grp = self._state_group()
        self.store.create_group(grp)
        self.store.write_attrs(
            grp, {"treedef": str(treedef), "n_leaves": len(leaves)},
        )
        for i, leaf in enumerate(leaves):
            self.store.write_array(f"{grp}/leaf_{i}", self._leaf_to_host(leaf))

    def load_state(self, like):
        import jax.numpy as jnp

        grp = self._state_group()
        attrs = self.store.read_attrs(grp)
        if not attrs:
            return None
        leaves_like, treedef = jax.tree.flatten(like)
        leaves = []
        for i, x in enumerate(leaves_like):
            arr = self.store.read_array(f"{grp}/leaf_{i}")
            if arr is None:
                return None
            if not getattr(x, "is_fully_addressable", True) and x.ndim >= 1:
                # rebuild the global sharded leaf from this process's block
                leaves.append(jax.make_array_from_process_local_data(
                    x.sharding, np.asarray(arr, dtype=x.dtype), x.shape
                ))
            else:
                leaves.append(
                    jnp.asarray(arr, dtype=x.dtype).reshape(x.shape)
                )
        return jax.tree.unflatten(treedef, leaves)

    # -------------------------------------------------------------- reads
    def read_draws(self):
        """(S_total, C, D) q + stats dict (the FileTrace read contract).
        In chain-shard mode returns THIS process's chain block (each
        controller resumes/packages its own chains)."""
        self._emit(final=True)
        self.store.flush()
        q = self.store.read_array("unconstrained_posterior/q")
        if q is None or q.shape[1] == 0:
            return None, {}
        lo = self._chain_offset
        hi = None if self._chains_local is None else lo + self._chains_local
        stats = {}
        for name in self._stat_names():
            arr = self.store.read_array(f"sample_stats/{name}")
            stats[name] = arr[lo:hi].T  # (S, C)
        return q[lo:hi].transpose(1, 0, 2), stats

    # -------------------------------------------------------- finalization
    def write_inference_data(self, idata, draws_per_chunk=None):
        """Persist the named, constrained groups (posterior, warmup_*,
        observed/constant data) from a finished InferenceData — the
        externally-readable face of the store (reference ZarrTrace stores
        per-variable draws; here they are written once at finalization)."""
        if self._chains_local is not None and \
                self._chains_local != (self._chains_total or 0):
            # multi-controller shard: each process's idata holds only its
            # local chains; the streaming groups (unconstrained_posterior,
            # sample_stats, _sampling_state shards) ARE the durable record.
            # Reassemble named groups host-side from the store if needed.
            return
        cd = draws_per_chunk or self.draws_per_chunk
        for group in ("posterior", "sample_stats", "warmup_posterior",
                      "warmup_sample_stats", "observed_data",
                      "constant_data"):
            ds = getattr(idata, group, None)
            if ds is None:
                continue
            gname = group if group != "sample_stats" else "sample_stats_full"
            self.store.create_group(gname)
            attrs = {
                k: v for k, v in getattr(ds, "attrs", {}).items()
                if isinstance(v, (str, int, float, bool, list))
            }
            if attrs:
                self.store.write_attrs(gname, attrs)
            for var in ds.keys():
                da = ds[var]
                arr = np.asarray(da.values)
                if arr.dtype.kind in ("U", "S", "O"):
                    continue
                dims = list(da.dims)
                chunked = cd if "draw" in dims[:2] and arr.ndim >= 2 else None
                self.store.write_array(
                    f"{gname}/{var}", arr, dim_names=dims,
                    chunk_draws=chunked,
                )
            # coordinate arrays (xarray convention: 1-D arrays named by dim)
            for cname, cvals in getattr(ds, "coords", {}).items():
                cvals = np.asarray(
                    getattr(cvals, "values", cvals)
                )
                if cvals.ndim != 1:
                    continue
                if cvals.dtype.kind in ("U", "S", "O"):
                    cvals = np.arange(len(cvals))
                self.store.write_array(
                    f"{gname}/{cname}", cvals, dim_names=[cname]
                )
        self.store.flush()
