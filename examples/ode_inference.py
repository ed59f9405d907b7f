"""Bayesian inference through a differentiable ODE solve."""
import numpy as np
import pymc_tpu as pm
from pymc_tpu.ode import DifferentialEquation
from scipy.integrate import odeint as sp_odeint

times = np.linspace(0.5, 8, 16)
r_true, K, y0 = 0.6, 10.0, 0.5
truth = sp_odeint(lambda y, t, r: r * y * (1 - y / K), y0,
                  np.concatenate([[0], times]), args=(r_true,))[1:, 0]
obs = truth + np.random.default_rng(0).normal(0, 0.2, len(times))

ode = DifferentialEquation(lambda y, t, p: p[0] * y[0] * (1 - y[0] / K),
                           times, n_states=1, n_theta=1)
with pm.Model() as m:
    r = pm.HalfNormal("r", 1.0)
    sol = ode(np.array([y0]), pm.math.stack([r]))
    pm.Normal("y", sol[:, 0], 0.2, observed=obs)

idata = pm.sample(draws=500, tune=500, chains=4, model=m, random_seed=1)
print(pm.summary(idata))
