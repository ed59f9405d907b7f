"""Systematic sampler-marginal correctness and gradient-finiteness sweeps.

Two nets the reference spreads across per-dist tests
(tests/distributions/test_continuous.py check_* + random testers):

1. KS test of every continuous distribution's ``sample()`` marginal against
   its scipy cdf (chi-square vs pmf for discretes) — catches wrong
   samplers outright (the round-2 sweeps caught shared-draw broadcast bugs
   this way; this catches wrong MARGINALS).
2. ``d logp / d value`` finiteness at interior points for every continuous
   distribution — NUTS dies silently on NaN gradients, so a formula that
   autodiffs to NaN inside the support is a sampler-breaking bug even when
   logp itself is finite.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.stats as st
from scipy.special import logit as sp_logit

import pymc_tpu as pm

SEED = jax.random.PRNGKey(2025)
N = 4000


def _key(name):
    # stable across processes (hash() is PYTHONHASHSEED-randomized)
    return jax.random.fold_in(SEED, sum(ord(c) for c in name))

# dist factory, scipy cdf, interior test points
CONTINUOUS = {
    "Uniform": (lambda: pm.Uniform.dist(-1.0, 3.0),
                st.uniform(-1.0, 4.0).cdf, [0.0, 1.5, 2.9]),
    "Normal": (lambda: pm.Normal.dist(1.0, 2.0),
               st.norm(1.0, 2.0).cdf, [-2.0, 1.0, 4.0]),
    "TruncatedNormal": (
        lambda: pm.TruncatedNormal.dist(0.5, 1.0, lower=-1.0, upper=2.0),
        st.truncnorm(-1.5, 1.5, loc=0.5, scale=1.0).cdf, [-0.5, 0.5, 1.5]),
    "HalfNormal": (lambda: pm.HalfNormal.dist(1.5),
                   st.halfnorm(0, 1.5).cdf, [0.2, 1.0, 3.0]),
    "SkewNormal": (lambda: pm.SkewNormal.dist(mu=0.5, sigma=1.2, alpha=3.0),
                   st.skewnorm(3.0, 0.5, 1.2).cdf, [0.0, 1.0, 2.5]),
    "Beta": (lambda: pm.Beta.dist(2.0, 3.0),
             st.beta(2.0, 3.0).cdf, [0.2, 0.5, 0.8]),
    "Kumaraswamy": (
        lambda: pm.Kumaraswamy.dist(2.0, 3.0),
        lambda x: 1 - (1 - np.asarray(x) ** 2.0) ** 3.0, [0.2, 0.5, 0.8]),
    "Exponential": (lambda: pm.Exponential.dist(lam=1.5),
                    st.expon(scale=1 / 1.5).cdf, [0.1, 0.7, 2.0]),
    "Laplace": (lambda: pm.Laplace.dist(mu=0.5, b=1.2),
                st.laplace(0.5, 1.2).cdf, [-1.0, 0.5, 2.0]),
    "AsymmetricLaplace": (
        lambda: pm.AsymmetricLaplace.dist(b=1.0, kappa=2.0, mu=0.0),
        st.laplace_asymmetric(2.0, 0.0, 1.0).cdf, [-1.0, 0.3, 1.5]),
    "StudentT": (lambda: pm.StudentT.dist(nu=4.0, mu=0.5, sigma=1.5),
                 st.t(4.0, 0.5, 1.5).cdf, [-2.0, 0.5, 3.0]),
    "HalfStudentT": (
        lambda: pm.HalfStudentT.dist(nu=5.0, sigma=2.0),
        lambda x: 2 * st.t(5.0, 0, 2.0).cdf(np.asarray(x)) - 1,
        [0.3, 1.0, 3.0]),
    "Cauchy": (lambda: pm.Cauchy.dist(alpha=0.0, beta=1.0),
               st.cauchy(0.0, 1.0).cdf, [-2.0, 0.0, 2.0]),
    "HalfCauchy": (lambda: pm.HalfCauchy.dist(beta=2.0),
                   st.halfcauchy(0, 2.0).cdf, [0.2, 1.0, 5.0]),
    "Gamma": (lambda: pm.Gamma.dist(alpha=3.0, beta=2.0),
              st.gamma(3.0, scale=0.5).cdf, [0.5, 1.5, 3.0]),
    "InverseGamma": (lambda: pm.InverseGamma.dist(alpha=3.0, beta=2.0),
                     st.invgamma(3.0, scale=2.0).cdf, [0.3, 0.8, 2.0]),
    "Weibull": (lambda: pm.Weibull.dist(alpha=2.0, beta=1.5),
                st.weibull_min(2.0, scale=1.5).cdf, [0.4, 1.2, 2.5]),
    "LogNormal": (lambda: pm.LogNormal.dist(mu=0.5, sigma=0.8),
                  st.lognorm(0.8, scale=np.exp(0.5)).cdf, [0.5, 1.5, 4.0]),
    "ChiSquared": (lambda: pm.ChiSquared.dist(nu=4.0),
                   st.chi2(4.0).cdf, [1.0, 3.5, 8.0]),
    "Wald": (lambda: pm.Wald.dist(mu=2.0, lam=3.0),
             st.invgauss(2.0 / 3.0, scale=3.0).cdf, [0.5, 1.5, 4.0]),
    "Pareto": (lambda: pm.Pareto.dist(alpha=3.0, m=1.0),
               st.pareto(3.0).cdf, [1.2, 2.0, 4.0]),
    "ExGaussian": (lambda: pm.ExGaussian.dist(mu=0.0, sigma=1.0, nu=1.5),
                   st.exponnorm(1.5, 0.0, 1.0).cdf, [-1.0, 0.5, 3.0]),
    "VonMises": (lambda: pm.VonMises.dist(mu=0.5, kappa=2.0),
                 st.vonmises(2.0, loc=0.5).cdf, [-1.0, 0.5, 2.0]),
    "Triangular": (lambda: pm.Triangular.dist(lower=-1.0, c=0.5, upper=2.0),
                   st.triang(0.5, loc=-1.0, scale=3.0).cdf,
                   [-0.5, 0.5, 1.5]),
    "Gumbel": (lambda: pm.Gumbel.dist(mu=0.5, beta=1.5),
               st.gumbel_r(0.5, 1.5).cdf, [-1.0, 1.0, 4.0]),
    "Rice": (lambda: pm.Rice.dist(b=1.5, sigma=1.0),
             st.rice(1.5, scale=1.0).cdf, [0.5, 1.8, 3.5]),
    "Logistic": (lambda: pm.Logistic.dist(mu=0.5, s=1.2),
                 st.logistic(0.5, 1.2).cdf, [-2.0, 0.5, 3.0]),
    "LogitNormal": (
        lambda: pm.LogitNormal.dist(mu=0.3, sigma=0.9),
        lambda x: st.norm(0.3, 0.9).cdf(sp_logit(np.asarray(x))),
        [0.2, 0.5, 0.8]),
    "Moyal": (lambda: pm.Moyal.dist(mu=0.5, sigma=1.2),
              st.moyal(0.5, 1.2).cdf, [-1.0, 1.0, 4.0]),
}

DISCRETE = {
    "Bernoulli": (lambda: pm.Bernoulli.dist(p=0.3),
                  lambda k: st.bernoulli(0.3).pmf(k), 2),
    "Binomial": (lambda: pm.Binomial.dist(n=10, p=0.4),
                 lambda k: st.binom(10, 0.4).pmf(k), 11),
    "BetaBinomial": (lambda: pm.BetaBinomial.dist(n=8, alpha=2.0, beta=3.0),
                     lambda k: st.betabinom(8, 2.0, 3.0).pmf(k), 9),
    "Poisson": (lambda: pm.Poisson.dist(mu=3.5),
                lambda k: st.poisson(3.5).pmf(k), 14),
    "NegativeBinomial": (
        lambda: pm.NegativeBinomial.dist(mu=4.0, alpha=2.0),
        lambda k: st.nbinom(2.0, 2.0 / 6.0).pmf(k), 25),
    "Geometric": (lambda: pm.Geometric.dist(p=0.35),
                  lambda k: st.geom(0.35).pmf(k), 15),
    "DiscreteUniform": (lambda: pm.DiscreteUniform.dist(lower=-2, upper=5),
                        lambda k: st.randint(-2, 6).pmf(k), None),
    "HyperGeometric": (lambda: pm.HyperGeometric.dist(N=20, k=7, n=8),
                       lambda k: st.hypergeom(20, 7, 8).pmf(k), 8),
    "Categorical": (lambda: pm.Categorical.dist(p=[0.2, 0.5, 0.3]),
                    lambda k: np.array([0.2, 0.5, 0.3])[np.asarray(k)], 3),
}


@pytest.mark.parametrize("name", sorted(CONTINUOUS))
def test_continuous_sampler_marginal(name):
    factory, cdf, _ = CONTINUOUS[name]
    d = factory()
    draws = np.asarray(d.sample(_key(name), (N,)))
    assert np.isfinite(draws).all(), f"{name}: non-finite draws"
    pval = st.kstest(draws, cdf).pvalue
    assert pval > 1e-3, f"{name}: sampler marginal mismatch (KS p={pval:.2e})"


@pytest.mark.parametrize("name", sorted(DISCRETE))
def test_discrete_sampler_marginal(name):
    factory, pmf, k_hi = DISCRETE[name]
    d = factory()
    draws = np.asarray(d.sample(_key(name), (N,)))
    if name == "Categorical":
        ks = np.arange(3)
    elif name == "DiscreteUniform":
        ks = np.arange(-2, 6)
    else:
        ks = np.arange(int(draws.min()), int(draws.max()) + 1)
    probs = np.asarray(pmf(ks), dtype=float)
    keep = probs > 0
    ks, probs = ks[keep], probs[keep]
    counts = np.array([(draws == k).sum() for k in ks], dtype=float)
    probs = probs / probs.sum()
    expected = N * probs
    # pool the sparse tail so every chi-square cell has expected >= 5
    cells_c, cells_e, acc_c, acc_e = [], [], 0.0, 0.0
    for c, e in zip(counts, expected):
        acc_c += c
        acc_e += e
        if acc_e >= 5.0:
            cells_c.append(acc_c)
            cells_e.append(acc_e)
            acc_c = acc_e = 0.0
    if acc_e > 0:
        cells_c[-1] += acc_c
        cells_e[-1] += acc_e
    cells_c, cells_e = np.asarray(cells_c), np.asarray(cells_e)
    chi2 = np.sum((cells_c - cells_e) ** 2 / cells_e)
    pval = st.chi2(max(len(cells_e) - 1, 1)).sf(chi2)
    assert pval > 1e-4, f"{name}: pmf mismatch (chi2 p={pval:.2e})"


# family -> (dist builder from a scalar theta, theta0, value at which to eval)
PARAM_GRAD = {
    "Normal_sigma": (lambda t: pm.Normal.dist(0.0, t), 1.3, 0.7),
    "TruncatedNormal_mu": (
        lambda t: pm.TruncatedNormal.dist(t, 1.0, lower=-1.0, upper=2.0),
        0.4, 0.5),
    "HalfNormal_sigma": (lambda t: pm.HalfNormal.dist(t), 1.5, 0.8),
    "SkewNormal_alpha": (
        lambda t: pm.SkewNormal.dist(mu=0.0, sigma=1.0, alpha=t), 2.0, 0.6),
    "Beta_alpha": (lambda t: pm.Beta.dist(t, 3.0), 2.0, 0.4),
    "Kumaraswamy_a": (lambda t: pm.Kumaraswamy.dist(t, 3.0), 2.0, 0.4),
    "Exponential_lam": (lambda t: pm.Exponential.dist(lam=t), 1.5, 0.9),
    "Laplace_b": (lambda t: pm.Laplace.dist(mu=0.0, b=t), 1.2, 0.5),
    "AsymmetricLaplace_kappa": (
        lambda t: pm.AsymmetricLaplace.dist(b=1.0, kappa=t, mu=0.0),
        2.0, 0.5),
    "StudentT_nu": (lambda t: pm.StudentT.dist(nu=t, mu=0.0, sigma=1.0),
                    4.0, 0.8),
    "HalfStudentT_nu": (lambda t: pm.HalfStudentT.dist(nu=t, sigma=1.0),
                        5.0, 0.8),
    "Cauchy_beta": (lambda t: pm.Cauchy.dist(alpha=0.0, beta=t), 1.0, 0.5),
    "HalfCauchy_beta": (lambda t: pm.HalfCauchy.dist(beta=t), 2.0, 1.0),
    "Gamma_alpha": (lambda t: pm.Gamma.dist(alpha=t, beta=2.0), 3.0, 1.2),
    "InverseGamma_alpha": (
        lambda t: pm.InverseGamma.dist(alpha=t, beta=2.0), 3.0, 0.8),
    "Weibull_alpha": (lambda t: pm.Weibull.dist(alpha=t, beta=1.5),
                      2.0, 1.0),
    "LogNormal_sigma": (lambda t: pm.LogNormal.dist(mu=0.0, sigma=t),
                        0.8, 1.5),
    "ChiSquared_nu": (lambda t: pm.ChiSquared.dist(nu=t), 4.0, 3.0),
    "Wald_lam": (lambda t: pm.Wald.dist(mu=2.0, lam=t), 3.0, 1.5),
    "Pareto_alpha": (lambda t: pm.Pareto.dist(alpha=t, m=1.0), 3.0, 1.5),
    "ExGaussian_nu": (
        lambda t: pm.ExGaussian.dist(mu=0.0, sigma=1.0, nu=t), 1.5, 0.7),
    "VonMises_kappa": (lambda t: pm.VonMises.dist(mu=0.0, kappa=t),
                       2.0, 0.5),
    "Triangular_c": (
        lambda t: pm.Triangular.dist(lower=-1.0, c=t, upper=2.0), 0.5, 0.8),
    "Gumbel_beta": (lambda t: pm.Gumbel.dist(mu=0.0, beta=t), 1.5, 1.0),
    "Rice_b": (lambda t: pm.Rice.dist(b=t, sigma=1.0), 1.5, 1.8),
    "Logistic_s": (lambda t: pm.Logistic.dist(mu=0.0, s=t), 1.2, 0.6),
    "LogitNormal_sigma": (
        lambda t: pm.LogitNormal.dist(mu=0.0, sigma=t), 0.9, 0.4),
    "Moyal_sigma": (lambda t: pm.Moyal.dist(mu=0.0, sigma=t), 1.2, 1.0),
    "Poisson_mu": (lambda t: pm.Poisson.dist(mu=t), 3.5, 2),
    "NegativeBinomial_alpha": (
        lambda t: pm.NegativeBinomial.dist(mu=4.0, alpha=t), 2.0, 3),
    "Binomial_p": (lambda t: pm.Binomial.dist(n=10, p=t), 0.4, 4),
    "BetaBinomial_alpha": (
        lambda t: pm.BetaBinomial.dist(n=8, alpha=t, beta=3.0), 2.0, 3),
    "Geometric_p": (lambda t: pm.Geometric.dist(p=t), 0.35, 3),
}


@pytest.mark.parametrize("name", sorted(PARAM_GRAD))
def test_param_gradient_finite(name):
    """d logp / d theta finiteness: hierarchical models differentiate
    through distribution parameters — a formula whose parameter autodiff
    is NaN at legitimate values breaks NUTS on the parent."""
    build, theta0, value = PARAM_GRAD[name]

    def lp(t):
        return jnp.sum(build(t).logp(value))

    gv = np.asarray(jax.grad(lp)(jnp.asarray(theta0, dtype=jnp.float64)))
    assert np.isfinite(gv).all(), (
        f"{name}: NaN/inf d logp/d param at theta={theta0}"
    )


@pytest.mark.parametrize("name", sorted(CONTINUOUS))
def test_value_gradient_finite_in_support(name):
    factory, _, points = CONTINUOUS[name]
    d = factory()

    def lp(v):
        return jnp.sum(d.logp(v))

    g = jax.grad(lp)
    for p in points:
        gv = np.asarray(g(jnp.asarray(p, dtype=jnp.float64)))
        assert np.isfinite(gv).all(), (
            f"{name}: NaN/inf d logp/d value at interior point {p}"
        )
