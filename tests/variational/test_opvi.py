"""OPVI surface: Group -> Approximation -> KLqp, sample_approx, optimizer
re-exports (reference variational/opvi.py:582,1237; updates.py)."""
import numpy as np
import pytest

import pymc_tpu as pm


def _model():
    with pm.Model() as m:
        mu = pm.Normal("mu", 0, 5)
        sd = pm.HalfNormal("sd", 1)
        pm.Normal("y", mu, sd,
                  observed=np.random.default_rng(0).normal(2, 1, 100))
    return m


def test_group_klqp_fit_recovers_posterior():
    m = _model()
    approx = pm.Approximation([pm.Group(None, vfam="full_rank")], model=m)
    fitted = pm.KLqp(approx).fit(
        4000, obj_optimizer=pm.adam(0.05), progressbar=False
    )
    idata = pm.sample_approx(fitted, draws=500, random_seed=1)
    assert abs(float(idata.posterior["mu"].values.mean()) - 2.0) < 0.3
    assert abs(float(idata.posterior["sd"].values.mean()) - 1.0) < 0.3


def test_group_validation():
    m = _model()
    with pytest.raises(NotImplementedError):
        pm.Approximation([pm.Group(None), pm.Group(None)], model=m)
    with pytest.raises(ValueError):
        pm.Group(None, vfam="banana")
    with pytest.raises(TypeError):
        pm.KLqp("not an approx")


def test_optimizer_reexports():
    import optax

    for name in ("sgd", "momentum", "nesterov_momentum", "adagrad",
                 "adagrad_window", "rmsprop", "adadelta", "adam", "adamax"):
        opt = getattr(pm, name)()
        assert hasattr(opt, "update")
    chained = pm.apply_momentum(pm.sgd(0.1), momentum=0.5)
    assert isinstance(chained, optax.GradientTransformation | type(chained))
