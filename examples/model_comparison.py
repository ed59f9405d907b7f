"""Model comparison with native PSIS-LOO / WAIC / stacking weights.

Fits two regression models (linear vs quadratic truth) and ranks them —
the reference delegates this surface to arviz; here it is built in
(pymc_tpu/stats/model_comparison.py).
"""
import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import pymc_tpu as pm  # noqa: E402


def main():
    rng = np.random.default_rng(42)
    x = np.linspace(-2, 2, 80)
    y = 1.0 + 0.5 * x + 0.8 * x**2 + rng.normal(0, 0.4, x.size)

    def make(order):
        with pm.Model() as m:
            beta = pm.Normal("beta", 0, 5, shape=order + 1)
            sd = pm.HalfNormal("sd", 2)
            mu = sum(beta[i] * x**i for i in range(order + 1))
            pm.Normal("y", mu, sd, observed=y)
        return m

    idatas, models = {}, {}
    for name, order in [("linear", 1), ("quadratic", 2)]:
        models[name] = make(order)
        idatas[name] = pm.sample(
            draws=1000, tune=1000, chains=4, model=models[name],
            random_seed=0, progressbar=False,
        )

    loo_q = pm.loo(idatas["quadratic"], model=models["quadratic"])
    print(loo_q, "\n")
    df = pm.compare(idatas, model_dict=models)
    print(df.to_string())
    assert df.index[0] == "quadratic"


if __name__ == "__main__":
    main()
