"""Ordinal regression with OrderedLogistic (the reference's classic
cutpoint model: pymc/distributions/discrete.py OrderedLogistic docstring).

Latent score eta = beta * x; observed K=4 ordered categories through
ordered cutpoints sampled with the ordered transform.
"""

import numpy as np

import pymc_tpu as pm

rng = np.random.default_rng(4)
n = 400
x = rng.normal(0, 1, n)
true_beta = 1.5
true_cuts = np.array([-1.0, 0.3, 1.5])
eta = true_beta * x
# generate ordinal outcomes from the logistic latent model
u = np.log(rng.random(n) / (1 - rng.random(n)))  # logistic noise
latent = eta + rng.logistic(0, 1, n)
y = (latent[:, None] > true_cuts[None, :]).sum(axis=1)  # 0..3

with pm.Model() as model:
    beta = pm.Normal("beta", 0.0, 5.0)
    cutpoints = pm.Normal(
        "cutpoints", mu=[-1.0, 0.0, 1.0], sigma=3.0, shape=3,
        transform=pm.distributions.transforms.ordered,
    )
    pm.OrderedLogistic("y", eta=beta * x, cutpoints=cutpoints, observed=y)

idata = pm.sample(draws=800, tune=800, chains=4, model=model, random_seed=0,
                  progressbar=False)

print(pm.summary(idata, var_names=["beta", "cutpoints"]))
beta_hat = float(idata.posterior["beta"].values.mean())
cuts_hat = idata.posterior["cutpoints"].values.mean(axis=(0, 1))
print("beta:", round(beta_hat, 3), "(true 1.5)")
print("cutpoints:", np.round(cuts_hat, 3), "(true", true_cuts, ")")
assert abs(beta_hat - true_beta) < 0.3
assert np.all(np.abs(cuts_hat - true_cuts) < 0.4)
