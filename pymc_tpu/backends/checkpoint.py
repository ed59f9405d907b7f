"""Crash-durable streaming trace + sampler checkpoint/resume.

Parity: reference pymc/backends/zarr.py (ZarrTrace:279 — incremental chunked
draw persistence, `_sampling_state` group with per-chain stepper state,
resume across crashes; wired into sampling/mcmc.py:1549-1583). zarr is not
available here; the store is a directory of npz chunk files + a pytree state
snapshot, with identical semantics: every flushed chunk survives a crash, and
`pm.sample(trace=FileTrace(path), resume=True)` continues from the saved
sampler state (step sizes, mass matrix, RNG position included).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["FileTrace", "save_pytree", "load_pytree"]


def save_pytree(path, tree):
    """Persist a JAX pytree of arrays as one npz + structure file."""
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(jax.device_get(x)) for i, x in enumerate(leaves)}
    np.savez(path + ".tmp.npz", **arrays)
    os.replace(path + ".tmp.npz", path + ".npz")
    with open(path + ".treedef", "w") as f:
        f.write(str(treedef))


def load_pytree(path, like):
    """Restore a pytree saved by save_pytree, using `like` for structure."""
    raw = np.load(path + ".npz")
    leaves_like, treedef = jax.tree.flatten(like)
    leaves = [
        jnp.asarray(raw[f"leaf_{i}"], dtype=x.dtype)
        for i, x in enumerate(leaves_like)
    ]
    return jax.tree.unflatten(treedef, leaves)


class FileTrace:
    """Append-only chunked trace store.

    Layout: <path>/meta.json, <path>/chunk_00000.npz (q draws + stats),
    <path>/state.npz (sampler carry snapshot).
    """

    def __init__(self, path, overwrite=False, use_native_writer=True):
        self.path = str(path)
        if overwrite and os.path.isdir(self.path):
            shutil.rmtree(self.path)
        os.makedirs(self.path, exist_ok=True)
        # Monotonic chunk index, initialized from what's already on disk so
        # resume appends after the last persisted chunk; never recomputed from
        # a directory scan mid-run (a scan would double-count chunks that the
        # background writer has persisted but that are still in _pending).
        self._next_chunk = self.n_chunks
        self._errors_seen = 0
        self._writer = None
        if use_native_writer:
            from .native_writer import AsyncChunkWriter

            w = AsyncChunkWriter()
            self._writer = w if w.available else None

    # ------------------------------------------------------------- writing
    def write_meta(self, meta):
        with open(os.path.join(self.path, "meta.json"), "w") as f:
            json.dump(meta, f)

    def read_meta(self):
        p = os.path.join(self.path, "meta.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    @staticmethod
    def _is_chunk(fname):
        # Completed chunks only: temp files are dot-prefixed and/or carry a
        # .tmp suffix, so both predicates exclude in-progress/orphaned writes.
        return fname.startswith("chunk_") and fname.endswith(".npz")

    @property
    def n_chunks(self):
        return len([f for f in os.listdir(self.path) if self._is_chunk(f)])

    def write_chunk(self, q_draws, stats):
        """q_draws (S, C, D); stats dict of (S, C) arrays. Atomic per chunk;
        persisted on the background C++ writer thread when available so the
        device loop never blocks on file IO."""
        i = self._next_chunk
        self._next_chunk += 1
        payload = {"q": np.asarray(jax.device_get(q_draws))}
        for k, v in stats.items():
            payload[f"stat_{k}"] = np.asarray(jax.device_get(v))
        target = os.path.join(self.path, f"chunk_{i:05d}.npz")
        if self._writer is not None:
            self._writer.write_npz(target, payload)
        else:
            tmp = os.path.join(self.path, f".tmp_chunk_{i:05d}.npz")
            np.savez(tmp, **payload)
            os.replace(tmp, target)

    def close(self):
        """Flush pending writes and release the async writer (reference
        trace close semantics: every written chunk is durable after this)."""
        self.flush()

    def flush(self):
        if self._writer is not None:
            self._writer.flush()
            errs = self._writer.errors
            if errs > self._errors_seen:
                n_new = errs - self._errors_seen
                self._errors_seen = errs
                raise IOError(
                    f"FileTrace background writer failed to persist {n_new} "
                    f"chunk(s) in {self.path} (total errors {errs}); draws "
                    "from those chunks were NOT saved (disk full / bad path?)"
                )

    def save_state(self, carry):
        save_pytree(os.path.join(self.path, "state"), carry)

    def load_state(self, like):
        p = os.path.join(self.path, "state")
        if not os.path.exists(p + ".npz"):
            return None
        return load_pytree(p, like)

    # ------------------------------------------------------------- reading
    def read_draws(self):
        """Concatenate all chunks -> (S_total, C, D) q + stats dict."""
        self.flush()
        files = sorted(
            f for f in os.listdir(self.path) if self._is_chunk(f)
        )
        qs, stats = [], {}
        for f in files:
            raw = np.load(os.path.join(self.path, f))
            qs.append(raw["q"])
            for k in raw.files:
                if k.startswith("stat_"):
                    stats.setdefault(k[5:], []).append(raw[k])
        if not qs:
            return None, {}
        return (
            np.concatenate(qs, axis=0),
            {k: np.concatenate(v, axis=0) for k, v in stats.items()},
        )
