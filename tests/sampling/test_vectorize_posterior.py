"""vectorize_over_posterior contract battery.

Ports the case inventory of reference tests/sampling/test_forward.py
(test_vectorize_over_posterior:2243, matches_sample:2300,
intermediate_rvs:2342) against this project's concrete-array semantics:
the reference returns a symbolically batched graph; here the outputs are
evaluated per posterior draw under vmap and returned as (chains, draws, ...)
arrays.
"""

import numpy as np
import pytest

import pymc_tpu as pm
from pymc_tpu.sampling.forward import vectorize_over_posterior


@pytest.fixture(scope="module", params=[True, False],
                ids=["nested", "flat"])
def model_to_vectorize(request):
    has_nested = request.param
    with pm.Model() as model:
        if has_nested:
            x_parent = pm.Normal("x_parent")
            x = pm.Normal("x", mu=x_parent)
        else:
            x = pm.Normal("x", mu=0.0)
        d = pm.Data("d", np.array([1.0, 2.0, 3.0]))
        obs = np.ones(3)
        y = pm.Deterministic("y", x * d)
        z = pm.Gamma("z", mu=pm.math.exp(y), sigma=pm.math.exp(y) * 0.1,
                     observed=obs)
        zd = pm.Deterministic("z_downstream", z * 2)
        idata = pm.sample_prior_predictive(100, random_seed=5)
    nodes = {"x": x, "y": y, "z": model.named_vars["z"], "z_downstream": zd,
             "d": d}
    if has_nested:
        nodes["x_parent"] = model.named_vars["x_parent"]
    return model, nodes, idata.prior, has_nested


class TestVectorizeMatrix:
    """reference test_vectorize_over_posterior parameter matrix."""

    def test_deterministic_with_input_rvs(self, model_to_vectorize):
        model, nodes, prior, nested = model_to_vectorize
        input_rvs = [nodes["x_parent"], nodes["x"]] if nested else [nodes["x"]]
        [vy] = vectorize_over_posterior(
            outputs=[nodes["y"]], posterior=prior, input_rvs=input_rvs,
            allow_rvs_in_graph=False,
        )
        assert vy.shape == (1, 100, 3)
        x_draws = np.asarray(prior["x"].values)
        np.testing.assert_allclose(
            vy, x_draws[..., None] * np.array([1.0, 2.0, 3.0]), rtol=1e-6
        )

    def test_observed_disallow_raises(self, model_to_vectorize):
        model, nodes, prior, nested = model_to_vectorize
        input_rvs = [nodes["x_parent"], nodes["x"]] if nested else [nodes["x"]]
        with pytest.raises(RuntimeError, match="random variables found"):
            vectorize_over_posterior(
                outputs=[nodes["z"]], posterior=prior, input_rvs=input_rvs,
                allow_rvs_in_graph=False,
            )

    def test_resample_disallow_raises(self, model_to_vectorize):
        model, nodes, prior, nested = model_to_vectorize
        with pytest.raises(RuntimeError, match="random variables found"):
            vectorize_over_posterior(
                outputs=[nodes["y"]], posterior=prior, input_rvs=[],
                allow_rvs_in_graph=False,
            )

    def test_conditioned_on_observed(self, model_to_vectorize):
        """z is resampled per draw; z_downstream reuses the SAME z draw."""
        model, nodes, prior, nested = model_to_vectorize
        input_rvs = [nodes["x_parent"], nodes["x"]] if nested else [nodes["x"]]
        vz, vzd = vectorize_over_posterior(
            outputs=[nodes["z"], nodes["z_downstream"]], posterior=prior,
            input_rvs=input_rvs, allow_rvs_in_graph=True, random_seed=3,
        )
        assert vz.shape == (1, 100, 3)
        assert vzd.shape == (1, 100, 3)
        np.testing.assert_allclose(vzd, 2 * vz, rtol=1e-6)
        # z is a fresh draw per posterior sample, not the observed constant
        assert len(np.unique(vz[0, :, 0])) > 50

    def test_resampled_rvs_vary_per_draw(self, model_to_vectorize):
        """input_rvs=[] resamples x independently per (chain, draw)."""
        model, nodes, prior, nested = model_to_vectorize
        [vy] = vectorize_over_posterior(
            outputs=[nodes["y"]], posterior=prior, input_rvs=[],
            allow_rvs_in_graph=True, random_seed=7,
        )
        assert vy.shape == (1, 100, 3)
        x_implied = vy[0, :, 0]  # y[...,0] = x * 1
        x_draws = np.asarray(prior["x"].values)[0]
        assert not np.allclose(np.sort(x_implied), np.sort(x_draws))
        assert len(np.unique(x_implied)) > 90


def test_vectorize_over_posterior_matches_sample():
    """reference test_vectorize_over_posterior_matches_sample: agreement
    with sample_posterior_predictive on moments, and obs tracks x."""
    rng = np.random.default_rng(1234)
    with pm.Model() as model:
        x = pm.Normal("x")
        obs = pm.Normal("obs", x, 0.1, observed=rng.normal(size=10))
        det = pm.Deterministic("det", model.named_vars["obs"] + 1)

    chains, draws = 2, 100
    x_posterior = np.broadcast_to(
        100.0 * np.arange(chains)[..., None], (chains, draws)
    ).copy()
    posterior = {"x": x_posterior}
    with model:
        vect_obs, vect_det = vectorize_over_posterior(
            outputs=[model.named_vars["obs"], det],
            posterior=posterior,
            input_rvs=[x],
            allow_rvs_in_graph=True,
            random_seed=1234,
        )
    assert vect_obs.shape == (chains, draws, 10)
    assert vect_det.shape == (chains, draws, 10)
    np.testing.assert_allclose(vect_obs + 1, vect_det, rtol=1e-6)
    # obs ~ N(x, 0.1): every resampled obs hugs its chain's x value
    assert np.all(np.abs(vect_obs - x_posterior[..., None]) < 1)
    # and the per-chain means match the posterior x
    np.testing.assert_allclose(
        vect_obs.mean(axis=(1, 2)), [0.0, 100.0], atol=0.05
    )


def test_vectorize_over_posterior_with_intermediate_rvs():
    """reference test_vectorize_over_posterior_with_intermediate_rvs: the
    same anonymous intermediate RV is shared across outputs, and shapes
    hold whether or not intermediates are requested."""
    with pm.Model() as model:
        a = pm.Normal("a")
        idata = pm.sample_prior_predictive(100, var_names=["a"],
                                           random_seed=11)
    b = pm.Normal.dist(a)
    c = b + 1
    d = pm.Normal.dist(c)

    vb, vc, vd = vectorize_over_posterior(
        outputs=[b, c, d], posterior=idata.prior, input_rvs=[a],
        allow_rvs_in_graph=True, random_seed=2,
    )
    assert vb.shape == (1, 100)
    assert vc.shape == (1, 100)
    assert vd.shape == (1, 100)
    # c reuses b's draw within each posterior sample
    np.testing.assert_allclose(vc, vb + 1, rtol=1e-6)

    [vd_only] = vectorize_over_posterior(
        outputs=[d], posterior=idata.prior, input_rvs=[a],
        allow_rvs_in_graph=True, random_seed=2,
    )
    assert vd_only.shape == (1, 100)
    # d | a has var 1 (from b) + 1 (own noise): the a-dependence survives
    a_draws = np.asarray(idata.prior["a"].values)
    corr = np.corrcoef(a_draws.ravel(), vd_only.ravel())[0, 1]
    assert corr > 0.3


def test_functional_form_still_works():
    """The original fn-based signature stays supported."""
    rng = np.random.default_rng(0)
    with pm.Model() as model:
        mu = pm.Normal("mu")
        pm.Normal("y", mu, 1.0, observed=rng.normal(size=5))
        idata = pm.sample_prior_predictive(50, random_seed=1)
    idata.add_groups = None  # not needed; build a posterior-like object

    class _IData:
        posterior = idata.prior

    out = vectorize_over_posterior(lambda env: env["mu"] ** 2, _IData(),
                                   model=model)
    np.testing.assert_allclose(
        out, np.asarray(idata.prior["mu"].values) ** 2, rtol=1e-6
    )
