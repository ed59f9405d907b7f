"""Forward-draw batch independence sweep: a size=(N,) draw must produce N
independent variates for EVERY distribution family (regression net for the
broadcast class of bugs where one component draw was shared across the
batch — found in hurdles and timeseries inits)."""

import numpy as np
import jax
import pytest

import pymc_tpu as pm


def _unique_frac(d, n=400, seed=0):
    draws = np.asarray(d.sample(jax.random.PRNGKey(seed)))
    assert draws.shape[0] == n, draws.shape
    first = draws.reshape(n, -1)[:, 0].astype(float)
    return len(np.unique(np.round(first, 6))) / n


CONTINUOUS_FAMILIES = [
    ("MvNormal", lambda n: pm.MvNormal.dist(mu=np.zeros(3), cov=np.eye(3),
                                            size=(n,))),
    ("MvStudentT", lambda n: pm.MvStudentT.dist(5.0, mu=np.zeros(3),
                                                scale=np.eye(3), size=(n,))),
    ("Dirichlet", lambda n: pm.Dirichlet.dist(a=2 * np.ones(3), size=(n,))),
    ("LKJCorr", lambda n: pm.LKJCorr.dist(n=3, eta=2.0, size=(n,))),
    ("Wishart", lambda n: pm.Wishart.dist(nu=5, V=np.eye(3), size=(n,))),
    ("MatrixNormal", lambda n: pm.MatrixNormal.dist(
        mu=np.zeros((2, 3)), rowcov=np.eye(2), colcov=np.eye(3), size=(n,))),
    ("KroneckerNormal", lambda n: pm.KroneckerNormal.dist(
        mu=np.zeros(6), covs=[np.eye(2), np.eye(3)], size=(n,))),
    ("ZeroSumNormal", lambda n: pm.ZeroSumNormal.dist(sigma=1.0,
                                                      shape=(n, 4))),
    ("CAR", lambda n: pm.CAR.dist(
        mu=np.zeros(4),
        W=np.array([[0, 1, 0, 0], [1, 0, 1, 0], [0, 1, 0, 1], [0, 0, 1, 0]]),
        alpha=0.5, tau=1.0, size=(n,))),
    ("StickBreakingWeights", lambda n: pm.StickBreakingWeights.dist(
        alpha=2.0, K=4, size=(n,))),
    ("HurdleGamma", lambda n: pm.HurdleGamma.dist(psi=1.0, alpha=2.0,
                                                  beta=1.0, size=(n,))),
    ("Mixture", lambda n: pm.Mixture.dist(
        w=[0.5, 0.5], comp_dists=[pm.Normal.dist(-3, 1.0),
                                  pm.Normal.dist(3, 1.0)], size=(n,))),
    ("Censored", lambda n: pm.Censored.dist(pm.Normal.dist(0, 1), lower=-3,
                                            upper=3, size=(n,))),
    ("Truncated", lambda n: pm.Truncated.dist(pm.Normal.dist(0, 1),
                                              lower=0.0, size=(n,))),
    ("GaussianRandomWalk", lambda n: pm.GaussianRandomWalk.dist(
        mu=0, sigma=1, steps=5, init_dist=pm.Normal.dist(0, 1), size=(n,))),
    ("GARCH11", lambda n: pm.GARCH11.dist(
        omega=0.1, alpha_1=0.2, beta_1=0.5, initial_vol=1.0, steps=5,
        size=(n,))),
]


@pytest.mark.parametrize("name,make", CONTINUOUS_FAMILIES,
                         ids=[c[0] for c in CONTINUOUS_FAMILIES])
def test_batch_draws_are_distinct(name, make):
    # continuous first components: essentially all values distinct
    assert _unique_frac(make(400)) > 0.8, name


def test_discrete_batch_variability():
    # integer draws can't be unique; check the batch has the right spread
    d = pm.Multinomial.dist(n=10, p=[0.3, 0.3, 0.4], size=(2000,))
    c0 = np.asarray(d.sample(jax.random.PRNGKey(0)))[:, 0]
    np.testing.assert_allclose(c0.std(), np.sqrt(10 * 0.3 * 0.7), rtol=0.1)
    d2 = pm.HurdlePoisson.dist(psi=1.0, mu=3.0, size=(2000,))
    c = np.asarray(d2.sample(jax.random.PRNGKey(1)))
    assert c.std() > 1.0  # zero-truncated Poisson(3) sd ~ 1.6
