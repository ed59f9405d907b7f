import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import numpy as np
import pymc_tpu as pm

J = 8
y = np.array([28., 8., -3., 7., -1., 1., 18., 12.])
sigma = np.array([15., 10., 16., 11., 9., 11., 10., 18.])

with pm.Model(coords={"school": np.arange(J)}) as m:
    mu = pm.Normal("mu", 0, 5)
    tau = pm.HalfCauchy("tau", 5)
    theta_t = pm.Normal("theta_t", 0, 1, dims="school")
    theta = pm.Deterministic("theta", mu + tau * theta_t, dims="school")
    obs = pm.Normal("obs", theta, sigma, observed=y, dims="school")

idata = pm.sample(draws=1000, tune=1000, chains=4, random_seed=42, progressbar=False, model=m)
print(idata)
post = idata.posterior
print("mu mean/sd:", post["mu"].values.mean(), post["mu"].values.std())
print("tau mean:", post["tau"].values.mean())
print("theta shape:", post["theta"].shape, "dims:", post["theta"].dims)
print("rhat mu:", pm.rhat(post["mu"].values))
print("ess mu:", pm.ess(post["mu"].values))
print("divergences:", idata.sample_stats["diverging"].values.sum())
print("mean tree_depth:", idata.sample_stats["tree_depth"].values.mean())
print("accept:", idata.sample_stats["acceptance_rate"].values.mean())
