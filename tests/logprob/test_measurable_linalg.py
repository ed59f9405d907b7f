"""Measurable matmul: linear change of variables for A @ x / x @ A.

Mirrors reference tests/logprob/test_linalg.py (test_matrix_vector_transform,
test_matrix_matrix_transform, test_broadcasted_matmul_fails) — with the
Jacobian multiplicity CORRECTED: the reference subtracts slogdet(A) once
(pymc/logprob/linalg.py:55); the true factor for a matrix-valued x is
|det A|^k with k the number of independently transformed columns (rows).
The reference's own matrix-matrix test hides the difference behind
rtol=1e-5 at |logp| ~ 1e7; here the matrix cases assert against the exact
MatrixNormal / change-of-variables closed forms at tight tolerance.
"""

import numpy as np
import pytest
import scipy.stats as st
from scipy.stats import matrix_normal, multivariate_normal

import pymc_tpu as pm


@pytest.mark.parametrize("univariate", [True, False])
def test_matrix_vector_transform(univariate):
    rng = np.random.default_rng(755)
    mu = rng.normal(size=2)
    if univariate:
        sigma = np.abs(rng.normal(size=2))
        cov = np.diag(sigma**2)
        with pm.Model():
            x = pm.Normal("x", mu=mu, sigma=sigma)
    else:
        A = rng.normal(size=(2, 2))
        cov = A.T @ A
        with pm.Model():
            x = pm.MvNormal("x", mu=mu, cov=cov)
    B = rng.normal(size=(2, 2))
    yv = rng.normal(size=2)
    np.testing.assert_allclose(
        float(pm.logp(B @ x, yv)),
        multivariate_normal.logpdf(yv, B @ mu, B @ cov @ B.T),
        rtol=1e-10,
    )


def test_vector_left_multiplication():
    rng = np.random.default_rng(7)
    mu = rng.normal(size=3)
    sigma = np.abs(rng.normal(size=3)) + 0.1
    with pm.Model():
        x = pm.Normal("x", mu=mu, sigma=sigma)
    B = rng.normal(size=(3, 3))
    yv = rng.normal(size=3)
    np.testing.assert_allclose(
        float(pm.logp(x @ B, yv)),
        multivariate_normal.logpdf(yv, mu @ B, B.T @ np.diag(sigma**2) @ B),
        rtol=1e-10,
    )


def test_matrix_matrix_transform_matches_matrixnormal():
    """D @ X @ C of a MatrixNormal is the transformed MatrixNormal — the
    correct Jacobian is p*slogdet(D) + n*slogdet(C) (reference linalg.py
    subtracts each once; see module docstring)."""
    rng = np.random.default_rng(46)
    n, p = 2, 3
    M = rng.normal(size=(n, p))
    A = rng.normal(size=(n, n)) * 0.5
    U = A.T @ A + 0.1 * np.eye(n)
    B = rng.normal(size=(p, p)) * 0.5
    V = B.T @ B + 0.1 * np.eye(p)
    with pm.Model():
        X = pm.MatrixNormal("X", mu=M, rowcov=U, colcov=V)
    D = rng.normal(size=(n, n))
    C = rng.normal(size=(p, p))
    Yv = rng.normal(size=(n, p))
    np.testing.assert_allclose(
        float(pm.logp(D @ X @ C, Yv)),
        matrix_normal.logpdf(Yv, D @ M @ C, D @ U @ D.T, C.T @ V @ C),
        rtol=1e-9,
    )


def test_matrix_elementwise_base_jacobian_multiplicity():
    """Univariate matrix base: each of the p columns transforms under D —
    the density pays p * slogdet(D)."""
    rng = np.random.default_rng(11)
    n, p = 3, 4
    M = rng.normal(size=(n, p))
    S = np.abs(rng.normal(size=(n, p))) + 0.2
    with pm.Model():
        X = pm.Normal("X", mu=M, sigma=S)
    D = rng.normal(size=(n, n))
    Yv = rng.normal(size=(n, p))
    Xv = np.linalg.solve(D, Yv)
    exp = st.norm.logpdf(Xv, M, S).sum() - p * np.linalg.slogdet(D)[1]
    np.testing.assert_allclose(float(pm.logp(D @ X, Yv)), exp, rtol=1e-10)
    # right multiplication: n rows transform under C
    C = rng.normal(size=(p, p))
    Yv2 = rng.normal(size=(n, p))
    Xv2 = Yv2 @ np.linalg.inv(C)
    exp2 = st.norm.logpdf(Xv2, M, S).sum() - n * np.linalg.slogdet(C)[1]
    np.testing.assert_allclose(float(pm.logp(X @ C, Yv2)), exp2, rtol=1e-10)


def test_transformed_rv_operand_composes():
    """The random operand may itself be a measurable expression."""
    rng = np.random.default_rng(5)
    mu = rng.normal(size=2)
    with pm.Model():
        x = pm.Normal("x", mu=mu, sigma=1.0)
    B = rng.normal(size=(2, 2))
    yv = rng.normal(size=2)
    # B @ (2x + 1) = linear of a normal
    np.testing.assert_allclose(
        float(pm.logp(B @ (2.0 * x + 1.0), yv)),
        multivariate_normal.logpdf(
            yv, B @ (2 * mu + 1), B @ (4 * np.eye(2)) @ B.T
        ),
        rtol=1e-10,
    )


def test_singular_matrix_is_neg_inf():
    with pm.Model():
        x = pm.Normal("x", shape=(2,))
    assert np.isneginf(float(pm.logp(np.ones((2, 2)) @ x, np.zeros(2))))


def test_sampling_matches_density():
    rng = np.random.default_rng(9)
    A = rng.normal(size=(2, 2))
    cov = A.T @ A + 0.2 * np.eye(2)
    with pm.Model():
        x = pm.MvNormal("x", mu=np.zeros(2), cov=cov)
    B = rng.normal(size=(2, 2))
    d = np.asarray(pm.draw(B @ x, draws=4000, random_seed=2))
    np.testing.assert_allclose(np.cov(d.T), B @ cov @ B.T, atol=0.25)


class TestRejections:
    def test_nonsquare_rejected(self):
        with pm.Model():
            x = pm.Normal("x", shape=(3,))
        with pytest.raises(TypeError, match="square"):
            pm.logp(np.ones((2, 3)) @ x, np.zeros(2))

    def test_two_random_operands_rejected(self):
        with pm.Model():
            x = pm.Normal("x", shape=(2,))
            Y = pm.Normal("Y", shape=(2, 2))
        with pytest.raises(TypeError, match="one random operand"):
            pm.logp(Y @ x, np.zeros(2))

    def test_broadcast_rv_rejected(self):
        """Reference test_broadcasted_matmul_fails: batched A reusing one
        RV draw across the batch yields dependent rows."""
        rng = np.random.default_rng(3)
        with pm.Model():
            x = pm.Normal("x", shape=(3, 2))
        A = rng.normal(size=(4, 3, 3))
        with pytest.raises(TypeError, match="broadcast"):
            pm.logp(A @ x, np.zeros((4, 3, 2)))

    def test_discrete_base_rejected(self):
        with pm.Model():
            k = pm.Poisson("k", mu=3.0, shape=(2,))
        with pytest.raises(TypeError, match="discrete"):
            pm.logp(np.eye(2) @ k, np.zeros(2))
