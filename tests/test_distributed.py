"""Multi-process distributed runtime test (SURVEY §5.8 distributed comms).

Spawns two real OS processes that each own 4 virtual CPU devices, joins them
via ``pm.parallel.init_distributed`` (jax.distributed coordination service),
forms one 8-device global mesh, and verifies a cross-process collective
(psum over a process-sharded global array) produces the correct global value
on every process — the same mechanism a multi-host TPU pod uses over DCN
(reference role: pymc/smc/sampling.py + step-method multiprocessing, redesigned
to the JAX multi-controller model per SURVEY §2.14).
"""

import os
import socket
import subprocess
import sys
import tempfile

import pytest

WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2])
coord = sys.argv[3]; outdir = sys.argv[4]
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)
import jax
jax.config.update("jax_platforms", "cpu")

import pymc_tpu as pm

pm.parallel.init_distributed(
    coordinator_address=coord, num_processes=nproc, process_id=pid
)

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

assert jax.process_count() == nproc, jax.process_count()
devs = jax.devices()
assert len(devs) == 4 * nproc, len(devs)

mesh = Mesh(np.array(devs), ("chains",))
# each process contributes its local shard of a global (8,) array
local = np.arange(4, dtype=np.float64) + 10.0 * pid
garr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("chains")), local, global_shape=(4 * nproc,)
)

@jax.jit
def total(x):
    return jnp.sum(x)

out = jax.device_get(total(garr))
expected = sum(float(np.sum(np.arange(4) + 10.0 * p)) for p in range(nproc))
assert out == expected, (out, expected)
with open(os.path.join(outdir, f"ok_{pid}"), "w") as f:
    f.write(str(float(out)))
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


SAMPLE_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2])
coord = sys.argv[3]; outdir = sys.argv[4]
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pymc_tpu as pm

pm.parallel.init_distributed(
    coordinator_address=coord, num_processes=nproc, process_id=pid
)
from jax.sharding import Mesh

devs = jax.devices()
assert len(devs) == 4 * nproc
mesh = Mesh(np.array(devs), ("chains",))

from pymc_tpu.backends.zarr import ZarrTrace

store_dir = os.path.join(outdir, "shared_store")
tr = ZarrTrace(store_dir, draws_per_chunk=50, use_native_writer=False)

y_obs = np.array([28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0])
sigma = np.array([15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0])
with pm.Model(coords={"school": np.arange(8)}) as m:
    mu = pm.Normal("mu", 0.0, 5.0)
    tau = pm.HalfCauchy("tau", 5.0)
    theta_t = pm.Normal("theta_t", 0.0, 1.0, dims="school")
    pm.Normal("y", mu + tau * theta_t, sigma, observed=y_obs)
    idata = pm.sample(draws=100, tune=150, chains=8, mesh=mesh,
                      random_seed=3, progressbar=False, trace=tr,
                      compute_convergence_checks=False)
tr.close()

# each controller holds exactly its local chain shard (4 of 8 chains)
assert idata.posterior["mu"].shape[0] == 4, idata.posterior["mu"].shape
np.savez(
    os.path.join(outdir, f"draws_{pid}.npz"),
    mu=idata.posterior["mu"].values,
    tau=idata.posterior["tau"].values,
    theta_t=idata.posterior["theta_t"].values,
)
"""


def test_two_process_pm_sample_matches_single_process(tmp_path):
    """End-to-end multi-controller pm.sample (SURVEY §2.14.8: the JAX
    multi-controller mesh REPLACES the reference's process-per-chain executor,
    pymc/sampling/parallel.py:140-602): two OS processes, one global 8-device
    mesh, each process materializes its own 4-chain shard — and the
    concatenated draws are bit-identical to a single-process 8-device run."""
    worker = tmp_path / "sample_worker.py"
    worker.write_text(SAMPLE_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", coord, str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed sample workers timed out")
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"

    import numpy as np
    import jax
    from jax.sharding import Mesh

    import pymc_tpu as pm

    y_obs = np.array([28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0])
    sigma = np.array([15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0])
    with pm.Model(coords={"school": np.arange(8)}) as m:
        mu = pm.Normal("mu", 0.0, 5.0)
        tau = pm.HalfCauchy("tau", 5.0)
        theta_t = pm.Normal("theta_t", 0.0, 1.0, dims="school")
        pm.Normal("y", mu + tau * theta_t, sigma, observed=y_obs)
        ref = pm.sample(draws=100, tune=150, chains=8,
                        mesh=Mesh(np.array(jax.devices()), ("chains",)),
                        random_seed=3, progressbar=False,
                        compute_convergence_checks=False)

    shards = [np.load(tmp_path / f"draws_{pid}.npz") for pid in range(2)]
    for name in ("mu", "tau", "theta_t"):
        combined = np.concatenate([s[name] for s in shards], axis=0)
        np.testing.assert_array_equal(
            combined, ref.posterior[name].values,
            err_msg=f"{name}: multi-process draws differ from single-process",
        )

    # the shared zarr store assembled the FULL (8-chain) global draw array
    # from the two controllers' disjoint chain-chunk writes, plus one
    # per-process _sampling_state shard each
    from pymc_tpu.backends.zarr import ZarrDirStore

    store = ZarrDirStore(str(tmp_path / "shared_store"))
    q = store.read_array("unconstrained_posterior/q")
    assert q is not None and q.shape[0] == 8 and q.shape[1] == 100, (
        None if q is None else q.shape
    )
    assert not np.isnan(q).any()
    meta = store.array_meta("unconstrained_posterior/q")
    assert meta["chunks"][0] == 4  # chain axis chunked at the shard size
    state_root = tmp_path / "shared_store" / "_sampling_state"
    assert (state_root / "shard_0").is_dir()
    assert (state_root / "shard_4").is_dir()


def test_two_process_distributed_psum(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", coord, str(tmp_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert (tmp_path / f"ok_{pid}").exists()
    # both processes computed the identical global reduction
    vals = {(tmp_path / f"ok_{pid}").read_text() for pid in range(2)}
    assert len(vals) == 1
