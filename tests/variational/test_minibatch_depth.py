"""Minibatch VI depth battery.

Ports the reference tests/variational/test_inference.py minibatch inventory:
multiple Minibatch variables share ONE random slice (the discourse-14308
regression — independent slices decouple features from targets and the fit
silently diverges), posterior sampling after removing minibatched nodes, and
set_data predictions after a minibatched fit.
"""

import numpy as np
import pytest

import jax
import pymc_tpu as pm
from pymc_tpu.graph import evaluate


def test_minibatch_variables_share_one_slice():
    """Draws of (x_mini, y_mini) stay PAIRED (reference bug class)."""
    x = np.arange(100.0)
    y = 2.0 * np.arange(100.0)
    xm, ym = pm.Minibatch(x, y, batch_size=7)
    key = {"__minibatch_key__": jax.random.PRNGKey(3)}
    xv = np.asarray(evaluate(xm, key))
    yv = np.asarray(evaluate(ym, key))
    np.testing.assert_allclose(yv, 2.0 * xv)
    assert len(np.unique(xv)) == 7


def test_multiple_minibatch_regression_recovers_weights():
    """Scaled-down reference test_multiple_minibatch_variables: linear
    regression through paired minibatches recovers the true weights."""
    rng = np.random.default_rng(8)
    true_w = np.array([-5.0, 5.0, -5.0, 5.0])
    feature = np.repeat(np.eye(4), 100, axis=0)
    rng.shuffle(feature)
    y = feature @ true_w
    with pm.Model() as model:
        fmini, ymini = pm.Minibatch(feature, y, batch_size=16)
        w = pm.Normal("weights", 0, 10, shape=4)
        pm.Normal("y", mu=fmini @ w, sigma=0.05, observed=ymini,
                  total_size=len(y))
        approx = pm.fit(4000, method="advi", progressbar=False,
                        obj_optimizer=pm.adam(learning_rate=0.05),
                        random_seed=9)
    means = approx.sample(500, random_seed=10).posterior["weights"].values
    np.testing.assert_allclose(means.mean(axis=(0, 1)), true_w, rtol=0.15)


def test_sample_posterior_after_minibatch_and_predictions():
    """Reference test_sample_posterior_after_minibatch: fit on minibatches,
    strip the minibatch nodes, posterior-sample, then set_data predictions."""
    from pymc_tpu.model.transform.basic import remove_minibatched_nodes

    with pm.Model(coords={"obs_id": [0, 1, 2]}) as model:
        x = pm.Data("x", [1.0, 2.0, 3.0], dims="obs_id")
        y = pm.Data("y", [1.0, 2.0, 3.0], dims="obs_id")
        x_mini, y_mini = pm.Minibatch(x, y, batch_size=2)
        beta = pm.Normal("beta", 0, 10.0)
        pm.Normal("obs", beta * x_mini, 0.1, observed=y_mini, total_size=3)
        approx = pm.fit(2000, method="advi", progressbar=False, random_seed=11,
                        obj_optimizer=pm.adam(learning_rate=0.05))

    model_post = remove_minibatched_nodes(model)
    trace = approx.sample(300, random_seed=12, model=model_post)
    assert trace.posterior["beta"].values.shape == (1, 300)
    beta_mean = float(trace.posterior["beta"].values.mean())
    assert abs(beta_mean - 1.0) < 0.2

    with model_post:
        x_test = [5.0, 6.0, 9.0, 12.0, 15.0]
        pm.set_data(
            {"x": x_test, "y": [0.0] * 5},
            coords={"obs_id": list(range(5))},
        )
        preds = pm.sample_posterior_predictive(
            trace, predictions=True, progressbar=False, random_seed=13
        )
    assert preds.predictions["obs"].values.shape == (1, 300, 5)
    # predictions track beta * x_test
    pred_mean = preds.predictions["obs"].values.mean(axis=(0, 1))
    np.testing.assert_allclose(pred_mean, np.asarray(x_test), rtol=0.25)


def test_fit_nan_guard_keeps_params_finite():
    """A poorly-scaled objective must not poison the approximation with NaNs
    (reference fit NaN diagnostics role)."""
    with pm.Model():
        x = pm.HalfNormal("x", 1e-8)
        approx = pm.fit(200, method="advi", progressbar=False, random_seed=14,
                        obj_optimizer=pm.adam(learning_rate=10.0))
    draws = approx.sample(50, random_seed=15).posterior["x"].values
    assert np.all(np.isfinite(draws))
