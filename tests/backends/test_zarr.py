"""Zarr v2 directory-store trace tests.

Mirrors reference tests/backends/test_zarr.py scope: store layout and
format conformance (readable by any zarr v2 reader — validated here with an
independent minimal reader), chunked append semantics, sampling-state
round-trip, pm.sample integration with bit-identical draws, and resume.
"""

import json
import math
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pymc_tpu as pm
from pymc_tpu.backends.zarr import ZarrDirStore, ZarrTrace


def _independent_read(path, name):
    """A from-scratch zarr v2 reader used ONLY for conformance checking:
    parses .zarray JSON and assembles raw C-order chunk files."""
    adir = os.path.join(path, name)
    with open(os.path.join(adir, ".zarray")) as f:
        meta = json.load(f)
    assert meta["zarr_format"] == 2
    assert meta["compressor"] is None
    assert meta["order"] == "C"
    shape, chunks = meta["shape"], meta["chunks"]
    dtype = np.dtype(meta["dtype"])
    grid = [max(1, math.ceil(s / c)) for s, c in zip(shape, chunks)]
    full = np.full(
        [g * c for g, c in zip(grid, chunks)], meta["fill_value"], dtype
    )
    for idx in np.ndindex(*grid):
        key = ".".join(map(str, idx))
        p = os.path.join(adir, key)
        if os.path.exists(p):
            block = np.fromfile(p, dtype=dtype).reshape(chunks)
            full[tuple(slice(i * c, (i + 1) * c)
                       for i, c in zip(idx, chunks))] = block
    return full[tuple(slice(0, s) for s in shape)]


class TestZarrDirStore:
    def test_group_and_array_format(self, tmp_path):
        store = ZarrDirStore(str(tmp_path / "s"))
        assert json.load(open(tmp_path / "s" / ".zgroup")) == {
            "zarr_format": 2
        }
        store.create_group("g")
        arr = np.arange(24.0).reshape(2, 3, 4)
        store.write_array("g/x", arr, dim_names=["a", "b", "c"])
        store.flush()
        meta = json.load(open(tmp_path / "s" / "g" / "x" / ".zarray"))
        assert meta["shape"] == [2, 3, 4]
        assert meta["dtype"] == "<f8"
        attrs = json.load(open(tmp_path / "s" / "g" / "x" / ".zattrs"))
        assert attrs["_ARRAY_DIMENSIONS"] == ["a", "b", "c"]
        np.testing.assert_array_equal(
            _independent_read(str(tmp_path / "s"), "g/x"), arr
        )

    def test_edge_chunk_padding_and_resize(self, tmp_path):
        store = ZarrDirStore(str(tmp_path / "s"))
        # 10 draws in chunks of 4 -> grid of 3 with a padded edge chunk
        arr = np.arange(2 * 10 * 3, dtype=np.float32).reshape(2, 10, 3)
        store.write_array("q", arr, dim_names=["chain", "draw", "d"],
                          chunk_draws=4)
        store.flush()
        np.testing.assert_array_equal(
            _independent_read(str(tmp_path / "s"), "q"), arr
        )
        # the edge chunk file is FULL chunk size (zarr pads, shape clips)
        edge = np.fromfile(tmp_path / "s" / "q" / "0.2.0", dtype=np.float32)
        assert edge.size == 2 * 4 * 3

    def test_dtype_coverage(self, tmp_path):
        store = ZarrDirStore(str(tmp_path / "s"))
        for i, dt in enumerate(
            [np.float64, np.float32, np.int64, np.int32, np.bool_]
        ):
            arr = np.array([[1, 0], [0, 1]], dtype=dt)
            store.write_array(f"a{i}", arr)
            store.flush()
            np.testing.assert_array_equal(
                _independent_read(str(tmp_path / "s"), f"a{i}"), arr
            )


class TestZarrTraceChunks:
    @pytest.mark.parametrize("use_native", [False, True])
    def test_varying_chunk_appends(self, tmp_path, use_native):
        tr = ZarrTrace(str(tmp_path / "t"), overwrite=True,
                       draws_per_chunk=8, use_native_writer=use_native)
        rng = np.random.default_rng(0)
        parts = [rng.normal(size=(s, 3, 2)) for s in (5, 11, 3, 7)]
        for i, p in enumerate(parts):
            tr.write_chunk(p, {"lp": np.full((p.shape[0], 3), float(i))})
        tr.close()
        q, stats = tr.read_draws()
        ref = np.concatenate(parts, axis=0)
        np.testing.assert_allclose(q, ref)
        assert stats["lp"].shape == (26, 3)
        np.testing.assert_allclose(stats["lp"][:5], 0.0)
        np.testing.assert_allclose(stats["lp"][16:19], 2.0)
        # externally readable with the independent reader: (chain, draw, D)
        ext = _independent_read(str(tmp_path / "t"),
                                "unconstrained_posterior/q")
        np.testing.assert_allclose(ext, ref.transpose(1, 0, 2))

    def test_reopen_appends_aligned(self, tmp_path):
        path = str(tmp_path / "t")
        tr = ZarrTrace(path, overwrite=True, draws_per_chunk=8,
                       use_native_writer=False)
        a = np.ones((5, 2, 2))
        tr.write_chunk(a, {"lp": np.zeros((5, 2))})
        tr.write_meta({"draws_done": 5})
        tr.close()
        # new process: reopen and append across the partial-chunk boundary
        tr2 = ZarrTrace(path, draws_per_chunk=8, use_native_writer=False)
        b = np.full((7, 2, 2), 2.0)
        tr2.write_chunk(b, {"lp": np.ones((7, 2))})
        tr2.write_meta({"draws_done": 12})
        tr2.close()
        q, stats = tr2.read_draws()
        np.testing.assert_allclose(q, np.concatenate([a, b], axis=0))
        np.testing.assert_allclose(stats["lp"][:5], 0.0)
        np.testing.assert_allclose(stats["lp"][5:], 1.0)
        assert tr2.read_meta()["draws_done"] == 12

    def test_state_roundtrip(self, tmp_path):
        tr = ZarrTrace(str(tmp_path / "t"), overwrite=True,
                       use_native_writer=False)
        carry = (
            jnp.arange(6.0).reshape(2, 3),
            {"eps": jnp.float32(0.5), "n": jnp.array([1, 2], jnp.int32)},
        )
        tr.save_state(carry)
        tr.close()
        back = tr.load_state(carry)
        np.testing.assert_allclose(np.asarray(back[0]), np.arange(6.0).reshape(2, 3))
        assert float(back[1]["eps"]) == 0.5
        assert back[1]["n"].dtype == jnp.int32


class TestZarrTraceSampling:
    def _model(self):
        y = np.random.default_rng(3).normal(1.0, 1.0, 30)
        with pm.Model() as m:
            mu = pm.Normal("mu", 0, 5)
            sigma = pm.HalfNormal("sigma", 1)
            pm.Normal("y", mu, sigma, observed=y)
        return m

    def test_trace_and_no_trace_identical(self, tmp_path):
        m1, m2 = self._model(), None
        idata_plain = pm.sample(
            draws=100, tune=100, chains=2, model=m1, random_seed=9,
            progressbar=False, compute_convergence_checks=False,
        )
        y = np.asarray(m1.observed_RVs[0].observed)
        with pm.Model() as m2:
            mu = pm.Normal("mu", 0, 5)
            sigma = pm.HalfNormal("sigma", 1)
            pm.Normal("y", mu, sigma, observed=y)
        tr = ZarrTrace(str(tmp_path / "t"), overwrite=True,
                       draws_per_chunk=32)
        idata_tr = pm.sample(
            draws=100, tune=100, chains=2, model=m2, random_seed=9,
            progressbar=False, compute_convergence_checks=False,
            trace=tr, chunk_size=25,
        )
        # invariant: trace/no-trace paths produce bit-identical draws
        np.testing.assert_array_equal(
            idata_plain.posterior["mu"].values, idata_tr.posterior["mu"].values
        )
        # named posterior group persisted and externally readable
        ext = _independent_read(str(tmp_path / "t"), "posterior/mu")
        np.testing.assert_allclose(
            ext, idata_tr.posterior["mu"].values, rtol=1e-6
        )
        attrs = json.load(
            open(tmp_path / "t" / "posterior" / "mu" / ".zattrs")
        )
        assert attrs["_ARRAY_DIMENSIONS"] == ["chain", "draw"]

    def test_resume_continues(self, tmp_path):
        path = str(tmp_path / "t")

        def build():
            y = np.random.default_rng(4).normal(0.5, 1.0, 20)
            with pm.Model() as m:
                mu = pm.Normal("mu", 0, 5)
                pm.Normal("y", mu, 1.0, observed=y)
            return m

        tr = ZarrTrace(path, overwrite=True, draws_per_chunk=16)
        pm.sample(draws=60, tune=60, chains=2, model=build(), random_seed=5,
                  progressbar=False, compute_convergence_checks=False,
                  trace=tr, chunk_size=20)
        assert tr.read_meta()["draws_done"] == 60
        tr2 = ZarrTrace(path, draws_per_chunk=16)
        idata = pm.sample(draws=150, tune=60, chains=2, model=build(),
                          random_seed=5, progressbar=False,
                          compute_convergence_checks=False,
                          trace=tr2, resume=True, chunk_size=20)
        assert idata.posterior["mu"].values.shape == (2, 150)
        assert tr2.read_meta()["draws_done"] == 150
