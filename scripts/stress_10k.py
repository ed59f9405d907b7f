"""BASELINE config #3 stress: hierarchical logistic GLM, ~10k params,
1024 vectorized chains (mass-matrix adaptation stress)."""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax
import pymc_tpu as pm

def build(n_groups=5000, n_obs=20000, seed=0):
    rng = np.random.default_rng(seed)
    g = rng.integers(0, n_groups, n_obs)
    x = rng.normal(size=n_obs)
    true_a = rng.normal(0, 0.5, n_groups)
    true_b = rng.normal(0.3, 0.2, n_groups)
    logits = true_a[g] + true_b[g] * x
    y = (rng.uniform(size=n_obs) < 1/(1+np.exp(-logits))).astype(int)
    with pm.Model() as m:
        mu_a = pm.Normal("mu_a", 0, 1)
        sd_a = pm.HalfNormal("sd_a", 1)
        mu_b = pm.Normal("mu_b", 0, 1)
        sd_b = pm.HalfNormal("sd_b", 1)
        a_t = pm.Normal("a_t", 0, 1, shape=(n_groups,))
        b_t = pm.Normal("b_t", 0, 1, shape=(n_groups,))
        a = mu_a + sd_a * a_t
        b = mu_b + sd_b * b_t
        pm.Bernoulli("y", logit_p=a[g] + b[g]*x, observed=y)
    return m

if __name__ == "__main__":
    chains = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    draws = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    m = build()
    print(f"D = {m.raveled_info().total_size} params, chains={chains}", flush=True)
    t0 = time.perf_counter()
    idata = pm.sample(draws=draws, tune=200, chains=chains, model=m, random_seed=0,
                      progressbar=False, compute_convergence_checks=False,
                      mass_adapt="pooled", sampler="chees",
                      var_names=["mu_a", "sd_a", "mu_b", "sd_b"])
    st = idata.posterior.attrs["sampling_time"]
    print(f"sampling={st:.1f}s total={time.perf_counter()-t0:.1f}s", flush=True)
    for v in ("mu_a","sd_a","mu_b","sd_b"):
        print(v, round(float(idata.posterior[v].values.mean()),3),
              "ess", round(float(np.nanmin(pm.ess(idata.posterior[v].values)))), flush=True)
