"""Diagnostics tests: rhat/ess/mcse behave correctly on synthetic chains."""

import numpy as np

from pymc_tpu.stats.convergence import ess, mcse_mean, rhat
from pymc_tpu.stats.summary import hdi


class TestRhat:
    def test_iid_chains_near_one(self):
        x = np.random.default_rng(0).normal(size=(4, 2000))
        r = rhat(x)
        assert abs(r - 1.0) < 0.01

    def test_shifted_chains_flagged(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(4, 500))
        x[0] += 3.0
        assert rhat(x) > 1.2

    def test_vector_params(self):
        x = np.random.default_rng(2).normal(size=(4, 800, 3))
        r = rhat(x)
        assert r.shape == (3,)
        assert np.all(np.abs(r - 1.0) < 0.02)


class TestEss:
    def test_iid_close_to_n(self):
        x = np.random.default_rng(3).normal(size=(4, 2500))
        e = ess(x)
        assert 0.75 * 10000 < e < 1.3 * 10000

    def test_correlated_much_smaller(self):
        rng = np.random.default_rng(4)
        n = 4000
        rho = 0.95
        eps = rng.normal(size=(4, n))
        x = np.zeros((4, n))
        for t in range(1, n):
            x[:, t] = rho * x[:, t - 1] + np.sqrt(1 - rho**2) * eps[:, t]
        e = ess(x)
        # AR(1): ESS ~ N (1-rho)/(1+rho) ~ N/39
        expected = 4 * n * (1 - rho) / (1 + rho)
        assert 0.4 * expected < e < 2.5 * expected

    def test_tail_reasonable(self):
        x = np.random.default_rng(5).normal(size=(4, 2500))
        e = ess(x, "tail")
        assert e > 2000

    def test_mcse(self):
        x = np.random.default_rng(6).normal(size=(4, 2500))
        m = mcse_mean(x)
        assert abs(m - 1.0 / np.sqrt(10000)) < 0.004


class TestHdi:
    def test_normal_hdi(self):
        x = np.random.default_rng(7).normal(size=(4, 5000))
        lo, hi = hdi(x, 0.94)
        assert abs(lo + 1.88) < 0.1
        assert abs(hi - 1.88) < 0.1


class TestEssUnbiasedAR1:
    """Quantitative oracle: on AR(1) chains the true integrated
    autocorrelation time is (1+rho)/(1-rho), so E[ESS] = C*N*(1-rho)/(1+rho).
    The estimator must be unbiased within ~5% averaged over replicates —
    this guards the headline min-ESS/sec bench metric itself."""

    @staticmethod
    def _ar1(rng, rho, c, n):
        x = np.zeros((c, n))
        e = rng.normal(size=(c, n))
        x[:, 0] = e[:, 0]
        for t in range(1, n):
            x[:, t] = rho * x[:, t - 1] + np.sqrt(1 - rho**2) * e[:, t]
        return x

    def test_mean_ess_matches_analytic_tau(self):
        rng = np.random.default_rng(0)
        for rho in (0.0, 0.5, 0.9):
            tau = (1 + rho) / (1 - rho)
            ratios = [
                float(ess(self._ar1(rng, rho, 4, 4000), "mean"))
                / (4 * 4000 / tau)
                for _ in range(20)
            ]
            assert abs(np.mean(ratios) - 1.0) < 0.06, (rho, np.mean(ratios))

    def test_bulk_ess_tracks_mean_ess_for_gaussian(self):
        # rank-normalization is ~identity for already-normal draws
        rng = np.random.default_rng(1)
        x = self._ar1(rng, 0.7, 4, 4000)
        b = float(ess(x, "bulk"))
        m = float(ess(x, "mean"))
        assert abs(b / m - 1.0) < 0.15, (b, m)
