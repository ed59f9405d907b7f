"""Radon-style hierarchical GLM with 1024 vectorized chains + summary."""
import numpy as np
import pymc_tpu as pm
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_model

model = build_model(pm)
idata = pm.sample(draws=500, tune=500, chains=64, model=model,
                  mass_adapt="pooled", random_seed=0)
print(pm.summary(idata, var_names=["mu_a", "mu_b", "sigma_a", "sigma_b", "sigma_y"]))
