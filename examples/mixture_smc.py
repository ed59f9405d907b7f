"""Gaussian mixture fit two ways: marginalized NUTS and tempered SMC."""
import numpy as np
import pymc_tpu as pm

rng = np.random.default_rng(0)
y = np.concatenate([rng.normal(-1, 0.4, 120), rng.normal(2, 0.6, 280)])

def build():
    with pm.Model() as m:
        w = pm.Dirichlet("w", a=np.ones(2))
        mu = pm.Normal("mu", np.array([-2., 1.]), 2.0, shape=(2,))
        sd = pm.HalfNormal("sd", 1.0, shape=(2,))
        pm.Mixture("y", w, pm.Normal.dist(mu, sd), observed=y)
    return m

idata = pm.sample(draws=800, tune=800, chains=4, model=build(), random_seed=1)
print("NUTS:", pm.summary(idata, var_names=["w", "mu"]))

ids = pm.sample_smc(draws=1500, chains=2, model=build(), random_seed=2)
print("SMC log marginal likelihood:",
      ids.posterior.attrs["log_marginal_likelihood"])
