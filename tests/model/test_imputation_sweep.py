"""Imputation parameter-gathering sweep.

The `{name}_unobserved` free RV built by automatic imputation must carry the
SAME per-position density as the full distribution restricted to the missing
indices — for batched params, params with event dims (Categorical p, Ordered
cutpoints), and dists whose stored param order differs from their
constructor's positional order (NegativeBinomial, BetaBinomial — the
original positional reconstruction scrambled those silently).

Reference role: PartialObservedRV semantics (pymc/distributions/distribution.py:782,
model/core.py:2033-2060).
"""

import numpy as np
import pytest

import pymc_tpu as pm
from pymc_tpu.exceptions import ImputationWarning
from pymc_tpu.graph import evaluate


def _eval(x, env=None):
    return np.asarray(evaluate(x, env or {}))


B = np.linspace(0.5, 1.5, 5)

SPECS = [
    (pm.Normal, {"mu": np.linspace(-1, 1, 5), "sigma": B}, 0.3),
    (pm.Gamma, {"alpha": 1 + B, "beta": B}, 1.2),
    (pm.StudentT, {"nu": 3 + B, "mu": 0.0, "sigma": B}, -0.4),
    (pm.Exponential, {"lam": B}, 0.7),
    (pm.Poisson, {"mu": 1 + B}, 2),
    (pm.Binomial, {"n": 10, "p": B / 2}, 3),
    (pm.Bernoulli, {"p": B / 2}, 1),
    (pm.Geometric, {"p": B / 2}, 2),
    (pm.NegativeBinomial, {"mu": 1 + B, "alpha": 2 * B}, 2),
    (pm.NegativeBinomial, {"n": 2 + B, "p": B / 2}, 2),
    (pm.BetaBinomial, {"alpha": 1 + B, "beta": 2 * B, "n": 10}, 3),
    (pm.HyperGeometric, {"N": 50, "k": 10, "n": 20}, 4),
    (pm.DiscreteUniform, {"lower": 0, "upper": np.arange(4, 9)}, 2),
    (pm.Categorical, {"p": np.tile(np.array([0.2, 0.3, 0.5]), (5, 1))}, 1),
    (pm.OrderedLogistic, {"eta": np.linspace(-1, 1, 5),
                          "cutpoints": np.array([-1.0, 0.0, 1.0])}, 1),
    (pm.OrderedProbit, {"eta": np.linspace(-1, 1, 5),
                        "cutpoints": np.array([-1.0, 0.0, 1.0]),
                        "sigma": 1.3}, 1),
    (pm.Beta, {"alpha": 1 + B, "beta": 2 * B}, 0.4),
    (pm.Weibull, {"alpha": 1 + B, "beta": B}, 0.8),
]


@pytest.mark.parametrize(
    "cls, kwargs, v", SPECS, ids=[f"{c.__name__}-{i}" for i, (c, k, v) in enumerate(SPECS)]
)
def test_imputed_slots_match_full_density(cls, kwargs, v):
    data = np.array([v, np.nan, v, np.nan, v], dtype=float)
    with pm.Model() as m:
        with pytest.warns(ImputationWarning):
            cls("x", observed=data, **kwargs)
    (free,) = [rv for rv in m.free_RVs if rv.name == "x_unobserved"]
    gathered = free.dist
    full = cls.dist(**kwargs)
    expected = _eval(full.logp(np.full(5, v)))[[1, 3]]
    got = _eval(gathered.logp(np.full(2, v)))
    np.testing.assert_allclose(got, expected, rtol=1e-10)
    assert np.all(np.isfinite(got))


def test_imputed_logp_total_matches_manual_split():
    # model logp at a point = observed-masked logp + missing logp
    data = np.array([0.5, np.nan, -0.3, np.nan], dtype=float)
    mu = np.array([0.0, 1.0, -1.0, 2.0])
    with pm.Model() as m:
        with pytest.warns(ImputationWarning):
            pm.Normal("x", mu=mu, sigma=1.0, observed=data)
    import scipy.stats as st

    missing_vals = np.array([0.7, -0.2])
    lp = m.compile_logp()({"x_unobserved": missing_vals})
    manual = (
        st.norm.logpdf(0.5, 0.0, 1.0)
        + st.norm.logpdf(-0.3, -1.0, 1.0)
        + st.norm.logpdf(0.7, 1.0, 1.0)
        + st.norm.logpdf(-0.2, 2.0, 1.0)
    )
    np.testing.assert_allclose(float(lp), manual, rtol=1e-10)
