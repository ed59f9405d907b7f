"""Trace/storage contract tests.

Mirrors the reference's backend contract harness (tests/backends/fixtures.py
run against NDArray/Zarr): the same behavioral suite exercised over
FileTrace (durable chunked store), the NDArray/MultiTrace shims, and
InferenceData persistence.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pymc_tpu as pm
from pymc_tpu.backends.base import (
    ChainRecordAdapter,
    MultiTrace,
    NDArray,
    multitrace_from_idata,
)
from pymc_tpu.backends.checkpoint import FileTrace


@pytest.fixture
def small_idata():
    with pm.Model(coords={"g": list("abc")}) as m:
        mu = pm.Normal("mu", 0, 1, dims="g")
        pm.Normal("y", mu.sum(), 1, observed=2.0)
    return pm.sample(
        draws=40, tune=40, chains=2, model=m, random_seed=0,
        progressbar=False, compute_convergence_checks=False,
    )


class TestFileTraceContract:
    def _mk(self, tmp_path, use_native):
        return FileTrace(
            os.path.join(tmp_path, f"tr_{use_native}"),
            overwrite=True, use_native_writer=use_native,
        )

    @pytest.mark.parametrize("use_native", [False, True])
    def test_chunk_roundtrip(self, tmp_path, use_native):
        tr = self._mk(str(tmp_path), use_native)
        rng = np.random.default_rng(0)
        chunks = [rng.normal(size=(5, 3, 4)).astype(np.float32)
                  for _ in range(3)]
        for i, c in enumerate(chunks):
            tr.write_chunk(c, {"lp": np.full((5, 3), float(i))})
            tr.write_meta({"draws_done": (i + 1) * 5, "chains": 3, "D": 4})
        tr.close()
        q, stats = tr.read_draws()
        np.testing.assert_allclose(q, np.concatenate(chunks, axis=0))
        assert stats["lp"].shape == (15, 3)
        np.testing.assert_allclose(stats["lp"][5:10], 1.0)
        assert tr.read_meta()["draws_done"] == 15

    @pytest.mark.parametrize("use_native", [False, True])
    def test_state_snapshot_roundtrip(self, tmp_path, use_native):
        tr = self._mk(str(tmp_path), use_native)
        carry = (
            jnp.arange(6.0).reshape(2, 3),
            {"eps": jnp.float32(0.5)},
            jnp.array([1, 2], dtype=jnp.int32),
        )
        tr.save_state(carry)
        tr.close()
        back = tr.load_state(carry)
        assert jnp.allclose(back[0], carry[0])
        assert float(back[1]["eps"]) == 0.5
        assert back[2].dtype == jnp.int32

    @pytest.mark.parametrize("use_native", [False, True])
    def test_orphaned_tmp_files_ignored(self, tmp_path, use_native):
        # A crash-orphaned in-progress temp file must not be counted as a
        # chunk nor np.load'ed on resume (round-1 advisor finding).
        tr = self._mk(str(tmp_path), use_native)
        tr.write_chunk(np.ones((2, 1, 1), np.float32), {"lp": np.zeros((2, 1))})
        tr.close()
        with open(os.path.join(tr.path, ".chunk_00001.npz.tmp"), "wb") as f:
            f.write(b"torn partial write")
        assert tr.n_chunks == 1
        q, _ = tr.read_draws()
        assert q.shape == (2, 1, 1)
        # Resume continues numbering after the last COMPLETED chunk.
        tr2 = FileTrace(tr.path, use_native_writer=use_native)
        tr2.write_chunk(np.full((2, 1, 1), 2.0, np.float32),
                        {"lp": np.zeros((2, 1))})
        tr2.close()
        q, _ = tr2.read_draws()
        assert q.shape == (4, 1, 1)
        np.testing.assert_allclose(q[2:], 2.0)

    def test_flush_completes_final_chunk(self, tmp_path):
        # flush() must wait for the in-flight write to finish, not just for
        # the queue to drain — read_draws right after a large enqueue must see
        # every chunk (round-1 advisor finding: flush raced the last write).
        tr = self._mk(str(tmp_path), True)
        if tr._writer is None:
            pytest.skip("native writer unavailable")
        big = np.zeros((64, 32, 128), np.float32)  # ~1MB: write takes a while
        for _ in range(8):
            tr.write_chunk(big, {"lp": np.zeros((64, 32))})
        q, _ = tr.read_draws()  # flushes internally
        assert q.shape == (8 * 64, 32, 128)
        assert tr.n_chunks == 8

    def test_monotonic_chunk_numbering(self, tmp_path):
        tr = self._mk(str(tmp_path), False)
        for _ in range(4):
            tr.write_chunk(np.zeros((1, 1, 1), np.float32),
                           {"lp": np.zeros((1, 1))})
        tr.close()
        names = sorted(f for f in os.listdir(tr.path) if f.startswith("chunk_"))
        assert names == [f"chunk_{i:05d}.npz" for i in range(4)]

    def test_writer_error_surfaces(self, tmp_path):
        tr = self._mk(str(tmp_path), True)
        if tr._writer is None:
            pytest.skip("native writer unavailable")
        # Point a chunk at a nonexistent directory: background write fails,
        # flush must raise instead of silently dropping draws.
        tr.path = os.path.join(str(tmp_path), "does", "not", "exist")
        with pytest.raises(IOError):
            tr.write_chunk(np.zeros((1, 1, 1), np.float32),
                           {"lp": np.zeros((1, 1))})
            tr.flush()

    def test_overwrite_semantics(self, tmp_path):
        path = os.path.join(str(tmp_path), "tr")
        tr = FileTrace(path, overwrite=True, use_native_writer=False)
        tr.write_chunk(np.zeros((2, 1, 1), np.float32), {"lp": np.zeros((2, 1))})
        tr.close()
        tr2 = FileTrace(path, overwrite=True, use_native_writer=False)
        tr2.close()
        q, stats = tr2.read_draws()
        assert q is None and stats == {}  # no chunks after overwrite


def _make_backend(kind, tmp_path, chain=0, tag=""):
    """Backend factory for the unified contract suite (reference
    tests/backends/fixtures.py pattern: ONE suite, every backend)."""
    if kind == "ndarray":
        return NDArray(chain=chain)
    if kind == "filetrace":
        store = FileTrace(
            os.path.join(str(tmp_path), f"store{tag}_{chain}"),
            overwrite=True, use_native_writer=False,
        )
        return ChainRecordAdapter(store, chain=chain, chunk_size=7)
    if kind == "filetrace_native":
        store = FileTrace(
            os.path.join(str(tmp_path), f"storen{tag}_{chain}"),
            overwrite=True, use_native_writer=True,
        )
        return ChainRecordAdapter(store, chain=chain, chunk_size=7)
    raise ValueError(kind)


BACKENDS = ["ndarray", "filetrace", "filetrace_native"]


@pytest.mark.parametrize("kind", BACKENDS)
class TestBackendContract:
    """The same behavioral suite run against every trace backend
    (reference tests/backends/fixtures.py, 606 LoC harness)."""

    N = 25

    def _fill(self, t, seed=0):
        rng = np.random.default_rng(seed)
        draws = []
        for i in range(self.N):
            point = {
                "mu": np.float64(rng.normal()),
                "theta": rng.normal(size=3),
            }
            stats = {"accept": float(rng.uniform()), "depth": float(i % 4)}
            t.record(point, stats)
            draws.append((point, stats))
        return draws

    def test_len_and_varnames(self, kind, tmp_path):
        t = _make_backend(kind, tmp_path)
        self._fill(t)
        assert len(t) == self.N
        assert set(t.varnames) == {"mu", "theta"}

    def test_get_values_shapes_and_content(self, kind, tmp_path):
        t = _make_backend(kind, tmp_path)
        draws = self._fill(t)
        mu = t.get_values("mu")
        theta = t.get_values("theta")
        assert mu.shape == (self.N,)
        assert theta.shape == (self.N, 3)
        np.testing.assert_allclose(mu, [d["mu"] for d, _ in draws])
        np.testing.assert_allclose(theta, [d["theta"] for d, _ in draws])

    def test_burn_thin_slicing(self, kind, tmp_path):
        t = _make_backend(kind, tmp_path)
        draws = self._fill(t)
        ref = np.asarray([d["mu"] for d, _ in draws])
        for burn, thin in [(0, 1), (5, 1), (0, 2), (5, 3), (24, 1)]:
            np.testing.assert_allclose(
                t.get_values("mu", burn=burn, thin=thin), ref[burn::thin]
            )

    def test_sampler_stats(self, kind, tmp_path):
        t = _make_backend(kind, tmp_path)
        draws = self._fill(t)
        acc = t.get_sampler_stats("accept")
        np.testing.assert_allclose(acc, [s["accept"] for _, s in draws])
        np.testing.assert_allclose(
            t.get_sampler_stats("depth", burn=10, thin=2),
            [s["depth"] for _, s in draws][10::2],
        )

    def test_point_access(self, kind, tmp_path):
        t = _make_backend(kind, tmp_path)
        draws = self._fill(t)
        pt = t.point(7)
        np.testing.assert_allclose(pt["mu"], draws[7][0]["mu"])
        np.testing.assert_allclose(pt["theta"], draws[7][0]["theta"])

    def test_multitrace_over_backend(self, kind, tmp_path):
        traces = []
        per_chain = []
        for c in range(2):
            t = _make_backend(kind, tmp_path, chain=c, tag="mt")
            per_chain.append(self._fill(t, seed=c))
            traces.append(t)
        mt = MultiTrace(traces)
        assert mt.nchains == 2
        assert sorted(mt.chains) == [0, 1]
        combined = mt.get_values("mu")
        assert combined.shape == (2 * self.N,)
        np.testing.assert_allclose(
            combined,
            np.concatenate([[d["mu"] for d, _ in ch] for ch in per_chain]),
        )
        per = mt.get_values("theta", combine=False)
        assert len(per) == 2 and per[0].shape == (self.N, 3)
        np.testing.assert_allclose(mt["mu"], combined)

    def test_close_flushes(self, kind, tmp_path):
        t = _make_backend(kind, tmp_path, tag="cl")
        draws = self._fill(t)
        t.close()
        np.testing.assert_allclose(
            t.get_values("mu"), [d["mu"] for d, _ in draws]
        )


class TestChainRecordAdapterDurability:
    def test_reopen_reads_back(self, tmp_path):
        path = os.path.join(str(tmp_path), "dur")
        store = FileTrace(path, overwrite=True, use_native_writer=False)
        t = ChainRecordAdapter(store, chunk_size=4)
        rng = np.random.default_rng(3)
        vals = []
        for _ in range(10):
            v = rng.normal(size=2)
            t.record({"w": v}, {"lp": float(v.sum())})
            vals.append(v)
        t.close()
        # fresh process view: reopen the store, layout comes from meta
        t2 = ChainRecordAdapter(FileTrace(path, use_native_writer=False))
        assert len(t2) == 10
        assert t2.varnames == ["w"]
        np.testing.assert_allclose(t2.get_values("w"), vals)
        np.testing.assert_allclose(
            t2.get_sampler_stats("lp"), [v.sum() for v in vals]
        )


class TestNDArrayMultiTrace:
    def test_record_and_query(self):
        t = NDArray(chain=0, varnames=["x"])
        for i in range(10):
            t.record({"x": np.float64(i)}, stats={"s": i * 2})
        assert len(t) == 10
        np.testing.assert_allclose(
            t.get_values("x", burn=2, thin=2), [2, 4, 6, 8]
        )
        np.testing.assert_allclose(
            t.get_sampler_stats("s", burn=8), [16, 18]
        )
        assert t.point(3)["x"] == 3

    def test_multitrace_from_idata(self, small_idata):
        mt = multitrace_from_idata(small_idata)
        assert mt.nchains == 2
        assert "mu" in mt.varnames
        vals = mt.get_values("mu")
        assert vals.shape[-1] == 3  # dims g
        pt = mt.point(-1, chain=0)
        assert pt["mu"].shape == (3,)


class TestInferenceDataPersistence:
    def test_npz_roundtrip(self, tmp_path, small_idata):
        p = os.path.join(str(tmp_path), "idata.npz")
        small_idata.to_npz(p)
        back = type(small_idata).from_npz(p)
        np.testing.assert_allclose(
            back.posterior["mu"].values, small_idata.posterior["mu"].values
        )
        assert list(back.posterior["mu"].dims) == ["chain", "draw", "g"]
        assert list(back.posterior.coords["g"]) == list("abc")

    def test_netcdf_alias(self, tmp_path, small_idata):
        p = os.path.join(str(tmp_path), "idata.nc")
        small_idata.to_netcdf(p)
        assert os.path.getsize(p) > 0
