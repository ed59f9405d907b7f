"""Out-of-sample prediction: pm.MutableData + pm.set_data + predictions.

The reference's canonical prediction workflow (pymc docs "Prediction"):
`shape=x.shape` ties the observed RV's size to the mutable container, so
swapping in test inputs resizes the posterior predictive.
"""
import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import pymc_tpu as pm  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    X_train = rng.normal(size=100)
    y_train = 1.5 + 2.0 * X_train + rng.normal(0, 0.5, 100)
    X_test = np.linspace(-3, 3, 9)

    with pm.Model() as model:
        x = pm.MutableData("x", X_train)
        a = pm.Normal("a", 0, 5)
        b = pm.Normal("b", 0, 5)
        sd = pm.HalfNormal("sd", 1)
        pm.Normal("y", a + b * x, sd, observed=y_train, shape=x.shape)

        idata = pm.sample(draws=1000, tune=1000, chains=4, random_seed=1,
                          progressbar=False)

        pm.set_data({"x": X_test})
        preds = pm.sample_posterior_predictive(
            idata, predictions=True, progressbar=False
        )

    yp = preds.predictions["y"].values  # (chains, draws, 9)
    mean = yp.mean(axis=(0, 1))
    lo, hi = np.percentile(yp, [3, 97], axis=(0, 1))
    truth = 1.5 + 2.0 * X_test
    for xi, m_, l_, h_, t_ in zip(X_test, mean, lo, hi, truth):
        print(f"x={xi:+.1f}  pred={m_:+.2f}  94% [{l_:+.2f}, {h_:+.2f}]"
              f"  truth={t_:+.2f}")
    assert np.all((truth > lo) & (truth < hi))


if __name__ == "__main__":
    main()
