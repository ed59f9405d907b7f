"""Crash-durable sampling: chunks stream to disk; resume continues."""
import tempfile

import numpy as np
import pymc_tpu as pm
from pymc_tpu.backends.checkpoint import FileTrace

y = np.random.default_rng(0).normal(1.0, 1.0, 50)

def build():
    with pm.Model() as m:
        mu = pm.Normal("mu", 0, 5)
        pm.Normal("y", mu, 1.0, observed=y)
    return m

store = tempfile.mkdtemp()
trace = FileTrace(store, overwrite=True)
pm.sample(draws=400, tune=300, chains=4, model=build(), trace=trace,
          chunk_size=100, random_seed=1)
print("persisted chunks:", trace.n_chunks)

# later (or after a crash): resume to more draws, warmup skipped
trace2 = FileTrace(store)
idata = pm.sample(draws=800, tune=300, chains=4, model=build(), trace=trace2,
                  resume=True, random_seed=1)
print(pm.summary(idata))
