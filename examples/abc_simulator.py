"""Likelihood-free inference with pm.Simulator + SMC."""
import jax
import numpy as np
import pymc_tpu as pm

data = np.random.default_rng(1).normal(1.5, 1.0, 200)

def simulate(key, mu):
    return mu + jax.random.normal(key, (200,))

with pm.Model() as m:
    mu = pm.Normal("mu", 0, 3)
    pm.Simulator("s", simulate, mu, sum_stat="sort", epsilon=0.5,
                 observed=data)

idata = pm.sample_smc(draws=1000, chains=2, model=m, random_seed=2)
print(pm.summary(idata))
