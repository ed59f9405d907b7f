"""Censored survival analysis (Weibull proportional-hazards regression).

The classic right-censored survival workflow (reference censored-data docs,
pymc/distributions/censored.py): event times follow a Weibull whose scale
depends on a covariate; subjects still alive at study end are right-censored
at their observation time. `pm.Censored` handles the mixed likelihood —
exact density for observed events, survival probability for censored ones —
in one vectorized observed node.
"""

import numpy as np

import pymc_tpu as pm
from pymc_tpu import math as pmm

rng = np.random.default_rng(7)
n = 500
x = rng.normal(0, 1, n)  # standardized covariate (e.g. treatment dose)
true_alpha = 1.6  # Weibull shape
true_b0, true_b1 = 1.2, -0.6  # log-scale regression
scale = np.exp(true_b0 + true_b1 * x)
t_event = scale * rng.weibull(true_alpha, n)

# administrative right-censoring at a fixed study end
t_end = 4.0
observed_t = np.minimum(t_event, t_end)
censored = t_event > t_end
print(f"{censored.mean():.0%} right-censored at t={t_end}")

with pm.Model() as model:
    alpha = pm.Gamma("alpha", alpha=2.0, beta=1.0)
    b0 = pm.Normal("b0", 0.0, 2.0)
    b1 = pm.Normal("b1", 0.0, 2.0)
    lam = pmm.exp(b0 + b1 * x)
    pm.Censored(
        "t",
        pm.Weibull.dist(alpha=alpha, beta=lam),
        lower=None,
        upper=t_end,
        observed=observed_t,
    )

idata = pm.sample(draws=800, tune=800, chains=4, model=model, random_seed=1,
                  progressbar=False)

print(pm.summary(idata, var_names=["alpha", "b0", "b1"]))
alpha_hat = float(idata.posterior["alpha"].values.mean())
b0_hat = float(idata.posterior["b0"].values.mean())
b1_hat = float(idata.posterior["b1"].values.mean())
print("alpha:", round(alpha_hat, 3), "(true 1.6)")
print("b0:", round(b0_hat, 3), "(true 1.2)  b1:", round(b1_hat, 3),
      "(true -0.6)")
assert abs(alpha_hat - true_alpha) < 0.25
assert abs(b0_hat - true_b0) < 0.25
assert abs(b1_hat - true_b1) < 0.25

# posterior median survival time at x=0: scale * ln(2)^(1/alpha)
surv_med = np.exp(b0_hat) * np.log(2.0) ** (1.0 / alpha_hat)
print("median survival at x=0:", round(surv_med, 3))
