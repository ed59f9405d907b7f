"""Metropolis proposal distributions (reference metropolis.py:74-123)."""
import numpy as np

import pymc_tpu as pm


class TestProposals:
    def test_all_proposals_sample_correct_posterior(self):
        from pymc_tpu.step_methods.metropolis import (
            CauchyProposal, LaplaceProposal, NormalProposal, UniformProposal,
        )

        y = np.random.default_rng(0).normal(2, 1, 80)
        with pm.Model() as m:
            mu = pm.Normal("mu", 0, 10)
            pm.Normal("y", mu, 1, observed=y)
        for prop in (NormalProposal, CauchyProposal, LaplaceProposal,
                     UniformProposal):
            step = pm.Metropolis(proposal_dist=prop, model=m)
            idata = pm.sample(
                draws=800, tune=800, chains=2, model=m, step=step,
                random_seed=0, progressbar=False,
                compute_convergence_checks=False,
            )
            est = float(idata.posterior["mu"].values.mean())
            assert abs(est - y.mean()) < 0.3, prop.__name__

    def test_mvn_and_poisson_proposal_draws(self):
        import jax
        from pymc_tpu.step_methods.metropolis import (
            MultivariateNormalProposal, PoissonProposal,
        )

        mv = MultivariateNormalProposal(np.array([[2.0, 0.6], [0.6, 1.0]]))
        d = np.asarray(mv(jax.random.PRNGKey(0), (4000, 2)))
        np.testing.assert_allclose(
            np.cov(d.T), [[2.0, 0.6], [0.6, 1.0]], atol=0.15
        )
        p = np.asarray(PoissonProposal(3.0)(jax.random.PRNGKey(1), (4000,)))
        assert abs(p.mean()) < 0.15
        assert np.allclose(p, np.round(p))
