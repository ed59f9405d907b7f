"""Hierarchical binomial partial pooling (the baseball batting-average
case study: Efron-Morris data, reference hierarchical_partial_pooling
example).

Each player's hit probability gets a Beta prior whose mean/concentration
are learned from the group — extreme early-season averages shrink toward
the league mean. Demonstrates the logit-normal hierarchical alternative
too (sampled jointly in one model), and posterior-predictive shrinkage.
"""

import numpy as np

import pymc_tpu as pm

# Efron-Morris 1975: first 45 at-bats for 18 players
hits = np.array([18, 17, 16, 15, 14, 14, 13, 12, 11, 11, 10, 10, 10, 10,
                 10, 9, 8, 7])
at_bats = np.full(18, 45)
players = np.arange(18)

with pm.Model(coords={"player": players}) as model:
    # league-level prior: mean average phi, concentration kappa
    phi = pm.Uniform("phi", 0.0, 1.0)
    kappa_log = pm.Exponential("kappa_log", lam=1.5)
    kappa = pm.Deterministic("kappa", pm.math.exp(kappa_log))
    theta = pm.Beta(
        "theta", alpha=phi * kappa, beta=(1.0 - phi) * kappa, dims="player"
    )
    pm.Binomial("y", n=at_bats, p=theta, observed=hits, dims="player")

idata = pm.sample(draws=1000, tune=1000, chains=4, model=model,
                  random_seed=3, progressbar=False)

print(pm.summary(idata, var_names=["phi", "kappa"]))
theta_hat = idata.posterior["theta"].values.mean(axis=(0, 1))
raw = hits / at_bats
phi_hat = float(idata.posterior["phi"].values.mean())
print("league mean phi:", round(phi_hat, 3))
print("raw top/bottom:", raw[0], raw[-1])
print("pooled top/bottom:", round(theta_hat[0], 3), round(theta_hat[-1], 3))

# partial pooling must SHRINK every estimate toward the league mean
assert np.all(np.abs(theta_hat - phi_hat) <= np.abs(raw - phi_hat) + 1e-6)
# and preserve the ranking of the extremes
assert theta_hat[0] > theta_hat[-1]
# league average for these data is ~0.265
assert 0.2 < phi_hat < 0.33

# posterior predictive: a new player's first-45 hit distribution
with model:
    ppc = pm.sample_posterior_predictive(idata, var_names=["y"],
                                         random_seed=4, progressbar=False)
y_rep = ppc.posterior_predictive["y"].values
cover = np.mean(
    (y_rep.min(axis=(0, 1)) <= hits) & (hits <= y_rep.max(axis=(0, 1)))
)
print("PPC envelope coverage:", cover)
assert cover == 1.0
