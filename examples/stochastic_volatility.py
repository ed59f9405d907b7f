"""Stochastic volatility (the classic PyMC case study: a GaussianRandomWalk
log-volatility latent driving StudentT returns — reference
pymc/distributions/timeseries.py GaussianRandomWalk + docs example).

Demonstrates: timeseries latents, Deterministic exp-transform, NUTS over a
few hundred correlated latent dimensions, vectorized chains on TPU.
"""

import numpy as np

import pymc_tpu as pm

# synthetic returns with a volatility regime shift
rng = np.random.default_rng(8)
T = 200
true_h = np.cumsum(rng.normal(0, 0.12, T)) - 1.0
returns = rng.standard_t(6, T) * np.exp(true_h)

with pm.Model() as model:
    step_sigma = pm.Exponential("step_sigma", 10.0)
    nu = pm.Exponential("nu", 0.1)
    h = pm.GaussianRandomWalk(
        "h", mu=0.0, sigma=step_sigma, steps=T - 1,
        init_dist=pm.Normal.dist(0.0, 1.0),
    )
    vol = pm.Deterministic("vol", pm.math.exp(h))
    pm.StudentT("r", nu=nu, mu=0.0, sigma=vol, observed=returns)

idata = pm.sample(draws=1000, tune=1000, chains=4, model=model, random_seed=1,
                  target_accept=0.95, progressbar=False)

post_vol = idata.posterior["vol"].values.mean(axis=(0, 1))
corr = np.corrcoef(post_vol, np.exp(true_h))[0, 1]
print(pm.summary(idata, var_names=["step_sigma", "nu"]))
print(f"posterior-mean vol vs truth correlation: {corr:.3f}")
assert corr > 0.5, "volatility path not recovered"
