"""ADVI / FullRank / SVGD with minibatching."""
import numpy as np
import optax
import pymc_tpu as pm

rng = np.random.default_rng(0)
y = rng.normal(2.0, 1.0, 10_000)
y_mb = pm.Minibatch(y, batch_size=250)

with pm.Model() as m:
    mu = pm.Normal("mu", 0, 10)
    sigma = pm.HalfNormal("sigma", 5)
    pm.Normal("y", mu, sigma, observed=y_mb, total_size=len(y))

approx = pm.fit(8000, model=m, obj_optimizer=optax.adam(0.02), random_seed=1)
idata = approx.sample(1000)
print(pm.summary(idata))
