"""GP regression: fit hyperparameters, predict at new inputs, HSGP variant."""
import numpy as np
import pymc_tpu as pm
from pymc_tpu.gp import cov as gpc

rng = np.random.default_rng(0)
X = np.linspace(0, 10, 80)[:, None]
y = np.sin(0.8 * X[:, 0]) + rng.normal(0, 0.2, 80)
Xnew = np.linspace(0, 12, 40)[:, None]

with pm.Model() as m:
    ls = pm.Gamma("ls", 4, 2)
    eta = pm.HalfNormal("eta", 2)
    sigma = pm.HalfNormal("sigma", 1)
    gp = pm.gp.Marginal(cov_func=eta**2 * gpc.Matern52(1, ls=ls))
    gp.marginal_likelihood("y", X=X, y=y, sigma=sigma)

idata = pm.sample(draws=500, tune=500, chains=4, model=m, random_seed=1)
print(pm.summary(idata))

with m:
    gp.conditional("fstar", Xnew)
ppc = pm.sample_posterior_predictive(idata, model=m, var_names=["fstar"],
                                     random_seed=2)
mu = ppc.posterior_predictive["fstar"].values.mean(axis=(0, 1))
print("prediction at x=11:", mu[-8])
