"""GP class-behavior depth battery.

Ports the reference tests/gp/test_gp.py inventory: additive GPs (Marginal /
MarginalApprox / Latent sums equal the summed-kernel GP, for both the
marginal likelihood and `conditional(..., given=)` of the total), additive
type/approx rejections, Marginal(sigma=0) vs Latent logp equivalence, the TP
conditional (Student-T family, dof growth, beta correction), and
Covariance-valued noise (WhiteNoise sigma).
"""

from functools import reduce
from operator import add

import numpy as np
import pytest
import scipy.stats as st

import pymc_tpu as pm
from pymc_tpu.graph import evaluate


def _eval(x, env=None):
    return np.asarray(evaluate(x, env or {}))


@pytest.fixture(scope="module")
def xy():
    rng = np.random.default_rng(10)
    X = rng.normal(size=(20, 3))
    y = rng.normal(size=20)
    Xnew = rng.normal(size=(25, 3))
    return X, y, Xnew


def _covs():
    return (
        pm.gp.cov.ExpQuad(3, np.array([0.1, 0.2, 0.3])),
        pm.gp.cov.ExpQuad(3, np.array([0.1, 0.2, 0.3])),
        pm.gp.cov.ExpQuad(3, np.array([0.1, 0.2, 0.3])),
    )


def _means():
    return (
        pm.gp.mean.Constant(0.5),
        pm.gp.mean.Constant(0.5),
        pm.gp.mean.Constant(0.5),
    )


class TestGPAdditive:
    def test_additive_marginal(self, xy):
        X, y, Xnew = xy
        noise = pm.gp.cov.WhiteNoise(0.1)
        with pm.Model() as model1:
            gps = [pm.gp.Marginal(mean_func=m, cov_func=c)
                   for m, c in zip(_means(), _covs())]
            gpsum = gps[0] + gps[1] + gps[2]
            gpsum.marginal_likelihood("f", X, y, sigma=noise)
            logp1 = float(model1.compile_logp()({}))

        with pm.Model() as model2:
            gptot = pm.gp.Marginal(
                mean_func=reduce(add, _means()), cov_func=reduce(add, _covs())
            )
            gptot.marginal_likelihood("f", X, y, sigma=noise)
            logp2 = float(model2.compile_logp()({}))
        np.testing.assert_allclose(logp1, logp2, rtol=1e-6)

        with model1:
            gpsum.conditional(
                "fp1", Xnew,
                given={"X": X, "y": y, "sigma": noise, "gp": gpsum},
            )
        with model2:
            gptot.conditional("fp2", Xnew)
        fp = np.random.default_rng(2).normal(size=Xnew.shape[0])
        lp1 = float(model1.compile_logp()({"fp1": fp}))
        lp2 = float(model2.compile_logp()({"fp2": fp}))
        np.testing.assert_allclose(lp1, lp2, rtol=1e-4)

    def test_additive_component_conditional_differs_from_total(self, xy):
        """Conditioning ONE component on the total's data uses the component
        kernel for cross terms — a real decomposition, not the total."""
        X, y, Xnew = xy
        with pm.Model() as model:
            gp1 = pm.gp.Marginal(cov_func=_covs()[0])
            gp2 = pm.gp.Marginal(cov_func=_covs()[1])
            gpsum = gp1 + gp2
            gpsum.marginal_likelihood("f", X, y, sigma=0.1)
            f1 = gp1.conditional(
                "f1", Xnew, given={"X": X, "y": y, "sigma": 0.1, "gp": gpsum}
            )
            f2 = gp2.conditional(
                "f2", Xnew, given={"X": X, "y": y, "sigma": 0.1, "gp": gpsum}
            )
            ftot = gpsum.conditional("ftot", Xnew)
        mu1 = _eval(f1.dist.mu)
        mu2 = _eval(f2.dist.mu)
        mut = _eval(ftot.dist.mu)
        # the component means decompose the total mean (equal kernels here,
        # so each component carries half)
        np.testing.assert_allclose(mu1 + mu2, mut + 0.0, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(mu1, mu2, rtol=1e-6)

    @pytest.mark.parametrize("approx", ["FITC", "VFE", "DTC"])
    def test_additive_marginal_approx(self, xy, approx):
        X, y, Xnew = xy
        Xu = np.random.default_rng(3).normal(size=(10, 3))
        sigma = 0.1
        with pm.Model() as model1:
            gps = [pm.gp.MarginalApprox(mean_func=m, cov_func=c, approx=approx)
                   for m, c in zip(_means(), _covs())]
            gpsum = gps[0] + gps[1] + gps[2]
            gpsum.marginal_likelihood("f", X, Xu, y, sigma=sigma)
            logp1 = float(model1.compile_logp()({}))
        with pm.Model() as model2:
            gptot = pm.gp.MarginalApprox(
                mean_func=reduce(add, _means()),
                cov_func=reduce(add, _covs()),
                approx=approx,
            )
            gptot.marginal_likelihood("f", X, Xu, y, sigma=sigma)
            logp2 = float(model2.compile_logp()({}))
        np.testing.assert_allclose(logp1, logp2, rtol=1e-6)

        with model1:
            gpsum.conditional(
                "fp1", Xnew,
                given={"X": X, "Xu": Xu, "y": y, "sigma": sigma, "gp": gpsum},
            )
        with model2:
            gptot.conditional("fp2", Xnew)
        fp = np.random.default_rng(4).normal(size=Xnew.shape[0])
        lp1 = float(model1.compile_logp()({"fp1": fp}))
        lp2 = float(model2.compile_logp()({"fp2": fp}))
        np.testing.assert_allclose(lp1, lp2, rtol=1e-4)

    def test_additive_latent(self, xy):
        X, y, Xnew = xy
        with pm.Model() as model1:
            gps = [pm.gp.Latent(mean_func=m, cov_func=c)
                   for m, c in zip(_means(), _covs())]
            gpsum = gps[0] + gps[1] + gps[2]
            gpsum.prior("fsum", X, reparameterize=False)
            logp1 = float(model1.compile_logp()({"fsum": y}))
        with pm.Model() as model2:
            gptot = pm.gp.Latent(
                mean_func=reduce(add, _means()), cov_func=reduce(add, _covs())
            )
            gptot.prior("fsum", X, reparameterize=False)
            logp2 = float(model2.compile_logp()({"fsum": y}))
        np.testing.assert_allclose(logp1, logp2, rtol=1e-6)

        with model1:
            gpsum.conditional("fp1", Xnew, given={"X": X, "f": y, "gp": gpsum})
        with model2:
            gptot.conditional("fp2", Xnew)
        fp = np.random.default_rng(5).normal(size=Xnew.shape[0])
        lp1 = float(model1.compile_logp()({"fsum": y, "fp1": fp}))
        lp2 = float(model2.compile_logp()({"fsum": y, "fp2": fp}))
        np.testing.assert_allclose(lp1, lp2, rtol=1e-4)

    def test_additive_sparse_raises(self):
        cov_func = pm.gp.cov.ExpQuad(3, np.array([0.1, 0.2, 0.3]))
        gp1 = pm.gp.MarginalApprox(cov_func=cov_func, approx="DTC")
        gp2 = pm.gp.MarginalApprox(cov_func=cov_func, approx="FITC")
        with pytest.raises(TypeError, match="different approximations"):
            gp1 + gp2

    def test_additive_type_raises(self):
        cov_func = pm.gp.cov.ExpQuad(3, np.array([0.1, 0.2, 0.3]))
        with pytest.raises(TypeError, match="Cannot add different GP types"):
            pm.gp.MarginalApprox(cov_func=cov_func, approx="DTC") + pm.gp.Marginal(
                cov_func=cov_func
            )
        with pytest.raises(TypeError, match="Cannot add different GP types"):
            pm.gp.Latent(cov_func=cov_func) + pm.gp.Marginal(cov_func=cov_func)

    def test_additive_tp_raises(self):
        cov_func = pm.gp.cov.ExpQuad(3, np.array([0.1, 0.2, 0.3]))
        gp1 = pm.gp.TP(cov_func=cov_func, nu=10)
        gp2 = pm.gp.TP(cov_func=cov_func, nu=10)
        with pytest.raises(TypeError, match="aren't additive"):
            gp1 + gp2


class TestMarginalVsLatent:
    def test_conditional_logp_equivalence(self, xy):
        """Marginal with sigma=0 equals Latent (reference TestMarginalVsLatent)."""
        X, y, Xnew = xy
        pnew = np.random.default_rng(6).normal(size=Xnew.shape[0])
        cov_func = pm.gp.cov.ExpQuad(3, np.array([0.1, 0.2, 0.3]))
        mean_func = pm.gp.mean.Constant(0.5)

        with pm.Model() as model_m:
            gp = pm.gp.Marginal(mean_func=mean_func, cov_func=cov_func)
            gp.marginal_likelihood("f", X, y, sigma=0.0)
            gp.conditional("p", Xnew)
        logp_marginal = float(model_m.compile_logp(vars=["p"])({"p": pnew}))

        with pm.Model() as model_l:
            gp = pm.gp.Latent(mean_func=mean_func, cov_func=cov_func)
            gp.prior("f", X, reparameterize=False)
            gp.conditional("p", Xnew)
        logp_latent = float(
            model_l.compile_logp(vars=["p"])({"f": y, "p": pnew})
        )
        np.testing.assert_allclose(logp_marginal, logp_latent, rtol=1e-3)

    def test_latent_reparam_logp_equivalence(self, xy):
        """reparameterize=True gives the same conditional density through the
        rotated parametrization."""
        X, y, Xnew = xy
        cov_func = pm.gp.cov.ExpQuad(3, np.array([0.1, 0.2, 0.3]))
        with pm.Model() as m1:
            gp1 = pm.gp.Latent(cov_func=cov_func)
            f1 = gp1.prior("f", X, reparameterize=True)
        with pm.Model() as m2:
            gp2 = pm.gp.Latent(cov_func=cov_func)
            f2 = gp2.prior("f", X, reparameterize=False)
        # same function values from matched latents
        v = np.random.default_rng(7).normal(size=X.shape[0])
        fv = _eval(f1, {"f_rotated_": v})
        K = _eval(cov_func(X))
        L = np.linalg.cholesky(K + 1e-6 * np.trace(K) / K.shape[0] * np.eye(K.shape[0]))
        np.testing.assert_allclose(fv, L @ v, rtol=1e-3, atol=1e-5)


class TestTPConditional:
    def test_tp_conditional_family_and_dof(self, xy):
        X, y, Xnew = xy
        cov_func = pm.gp.cov.ExpQuad(3, np.array([0.1, 0.2, 0.3]))
        with pm.Model() as m:
            tp = pm.gp.TP(cov_func=cov_func, nu=7)
            tp.prior("f", X, reparameterize=False)
            p = tp.conditional("p", Xnew)
        from pymc_tpu.distributions.multivariate import MvStudentT

        assert isinstance(p.dist, MvStudentT)
        env = {"f": y}
        nu_new = _eval(p.dist.nu, env)
        assert float(nu_new) == 7 + X.shape[0]

    def test_tp_large_nu_approaches_gp(self, xy):
        """At huge nu the TP conditional mean matches the GP conditional."""
        X, y, Xnew = xy
        cov_func = pm.gp.cov.ExpQuad(3, np.array([0.1, 0.2, 0.3]))
        with pm.Model():
            tp = pm.gp.TP(cov_func=cov_func, nu=1e7)
            tp.prior("ft", X, reparameterize=False)
            pt_ = tp.conditional("pt_", Xnew)
        with pm.Model():
            gp = pm.gp.Latent(cov_func=cov_func)
            gp.prior("fg", X, reparameterize=False)
            pg = gp.conditional("pg", Xnew)
        mu_t = _eval(pt_.dist.mu, {"ft": y})
        mu_g = _eval(pg.dist.mu, {"fg": y})
        np.testing.assert_allclose(mu_t, mu_g, rtol=1e-5)
