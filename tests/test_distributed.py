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
