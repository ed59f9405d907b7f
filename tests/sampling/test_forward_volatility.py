"""sample_posterior_predictive volatility knobs: var_names / sample_vars /
freeze_vars semantics and the ImplicitFreezeWarning.

Ports the case inventory of reference
tests/sampling/test_forward.py::TestSamplePosteriorPredictiveVolatility
(:1524-1812) plus the observed-dependent-deterministic default (:2173) onto
this project's API (fake traces are built with to_inference_data instead of
arviz.from_dict; graph edits use set_data / hand-stale trace values instead
of pm.do).
"""

import numpy as np
import pytest

import pymc_tpu as pm
from pymc_tpu.backends.arviz import to_inference_data
from pymc_tpu.exceptions import ImplicitFreezeWarning


def _fake_idata(model, posterior):
    post = {k: np.asarray(v, dtype=float) for k, v in posterior.items()}
    return to_inference_data(model, posterior=post)


class TestSampleVarsFreezeVars:
    def test_var_names_output_vs_sample_vars_resample(self):
        # var_names controls output only; sample_vars triggers resampling
        with pm.Model() as model:
            mu = pm.Normal("mu", 0, 1)
            pm.Normal("obs", mu, 1, observed=np.zeros(5))
            idata = _fake_idata(model, {"mu": np.ones((1, 100))})

            ppc_copied = pm.sample_posterior_predictive(
                idata, var_names=["mu", "obs"], return_inferencedata=False,
                progressbar=False, random_seed=0,
            )
            np.testing.assert_array_equal(
                ppc_copied["mu"].flatten(), np.ones(100)
            )
            assert "obs" in ppc_copied

            ppc_resampled = pm.sample_posterior_predictive(
                idata, var_names=["mu", "obs"], sample_vars=["mu"],
                return_inferencedata=False, progressbar=False, random_seed=0,
            )
            assert not np.all(ppc_resampled["mu"] == 1.0)
            assert "obs" in ppc_resampled

    def test_overlap_raises(self):
        with pm.Model() as model:
            mu = pm.Normal("mu", 0, 1)
            pm.Normal("obs", mu, 1, observed=np.zeros(5))
            idata = _fake_idata(model, {"mu": np.ones((1, 10))})
            with pytest.raises(
                ValueError, match="both sample_vars and freeze_vars"
            ):
                pm.sample_posterior_predictive(
                    idata, sample_vars=["mu"], freeze_vars=["mu"]
                )

    def test_freeze_vars_not_in_trace_raises(self):
        with pm.Model() as model:
            mu = pm.Normal("mu")
            pm.Normal("extra", 0, 1)
            pm.Normal("obs", mu, 1, observed=np.zeros(1))
            idata = _fake_idata(model, {"mu": np.ones((1, 5))})
            with pytest.raises(ValueError, match="not present in the trace"):
                pm.sample_posterior_predictive(idata, freeze_vars=["extra"])

    def test_sample_vars_rejects_data(self):
        with pm.Model() as model:
            x = pm.Data("x", [1.0, 2.0, 3.0])
            mu = pm.Normal("mu")
            pm.Normal("obs", mu=mu + x.mean(), sigma=1.0,
                      observed=np.zeros(3))
            idata = _fake_idata(model, {"mu": np.zeros((1, 4))})
            with pytest.raises(
                ValueError, match="not random variables or deterministics"
            ):
                pm.sample_posterior_predictive(idata, sample_vars=["x"])

    def test_sample_vars_not_in_var_names_excluded_from_output(self):
        # resampling y makes z volatile; z not in sample_vars -> implicit
        # freeze warning + trace value kept; y excluded from output
        with pm.Model() as model:
            y = pm.Normal("y")
            z = pm.Normal("z", y)
            pm.Normal("obs", z, 1e-6, observed=np.zeros(1))
            z_vals = np.array([[0.3, -0.7]])
            idata = _fake_idata(
                model, {"y": np.array([[0.1, 1.2]]), "z": z_vals}
            )
            with pytest.warns(
                ImplicitFreezeWarning, match="ancestor is resampled"
            ):
                ppc = pm.sample_posterior_predictive(
                    idata, sample_vars=["y"], var_names=["z"],
                    return_inferencedata=False, progressbar=False,
                    random_seed=0,
                )
        np.testing.assert_allclose(ppc["z"], z_vals)
        assert set(ppc) == {"z"}

    def test_var_names_not_in_trace_is_sampled(self):
        # a free RV absent from the trace is resampled and can be returned
        with pm.Model() as model:
            mu = pm.Normal("mu")
            sigma = pm.HalfNormal("sigma", 1.0)
            pm.Normal("obs", mu, sigma, observed=np.zeros(3))
            idata = _fake_idata(model, {"mu": np.zeros((1, 50))})
            ppc = pm.sample_posterior_predictive(
                idata, var_names=["sigma", "obs"],
                return_inferencedata=False, progressbar=False, random_seed=0,
            )
        assert ppc["sigma"].shape == (1, 50)
        assert np.all(ppc["sigma"] > 0)
        assert len(np.unique(ppc["sigma"])) > 10


class TestDeterministicVolatility:
    def test_freeze_deterministic(self):
        # HSGP-standardization use case: freezing a data-derived
        # deterministic keeps the training-time value after set_data
        with pm.Model() as model:
            x = pm.Data("x", [1.0, 2.0, 3.0])
            x_mean = pm.Deterministic("x_mean", x.mean())
            centered = pm.Deterministic("centered", x - x_mean)
            scale = pm.Normal("scale", 1.0, 1e-10)
            pm.Normal("obs", scale * centered, 1e-6, observed=np.zeros(3))
            idata = _fake_idata(
                model,
                {
                    "scale": np.ones((1, 2)),
                    "x_mean": np.full((1, 2), 2.0),
                },
            )

            pm.set_data({"x": [100.0, 200.0, 300.0]})
            # no freeze: x_mean recomputed as 200 -> centered [-100, 0, 100]
            # (no ImplicitFreezeWarning: no trace RV sits downstream of x)
            ppc = pm.sample_posterior_predictive(
                idata, return_inferencedata=False, progressbar=False,
                random_seed=0,
            )
            np.testing.assert_allclose(
                ppc["obs"][0, 0], [-100.0, 0.0, 100.0], atol=1e-3
            )
            # freeze x_mean at the training-time 2.0 -> centered [98,198,298]
            ppc_frozen = pm.sample_posterior_predictive(
                idata, freeze_vars=["x_mean"],
                return_inferencedata=False, progressbar=False,
                random_seed=0,
            )
            np.testing.assert_allclose(
                ppc_frozen["obs"][0, 0], [98.0, 198.0, 298.0], atol=1e-3
            )

    def test_sample_vars_deterministic_forces_recompute(self):
        # a stale trace deterministic is copied by default; sample_vars
        # forces a fresh computation from the (trace) inputs
        with pm.Model() as model:
            x = pm.Normal("x")
            pm.Deterministic("det", x**2)
            pm.Normal("obs", model["det"], 1e-6, observed=np.zeros(1))
            x_trace = np.array([[0.5, -1.5, 2.0]])
            stale_det = np.array([[9.9, 8.8, 7.7]])  # NOT x**2
            idata = _fake_idata(model, {"x": x_trace, "det": stale_det})

            ppc_copied = pm.sample_posterior_predictive(
                idata, var_names=["det"], return_inferencedata=False,
                progressbar=False, random_seed=0,
            )
            np.testing.assert_allclose(ppc_copied["det"], stale_det)

            ppc_forced = pm.sample_posterior_predictive(
                idata, var_names=["det"], sample_vars=["det"],
                return_inferencedata=False, progressbar=False, random_seed=0,
            )
            np.testing.assert_allclose(ppc_forced["det"], x_trace**2)

    def test_volatile_deterministic_recomputed_by_default(self):
        # a deterministic whose Data input changed recomputes even when its
        # (stale) value is in the trace
        with pm.Model() as model:
            x = pm.Data("x", [1.0, 2.0, 3.0])
            xm = pm.Deterministic("xm", x.mean())
            mu = pm.Normal("mu")
            pm.Normal("obs", mu + xm, 1e-6, observed=np.zeros(3))
            idata = _fake_idata(
                model, {"mu": np.zeros((1, 3)), "xm": np.full((1, 3), 2.0)}
            )
            pm.set_data({"x": [10.0, 20.0, 30.0]})
            ppc = pm.sample_posterior_predictive(
                idata, var_names=["xm", "obs"], return_inferencedata=False,
                progressbar=False, random_seed=0,
            )
        np.testing.assert_allclose(ppc["xm"], 20.0)
        np.testing.assert_allclose(ppc["obs"][0, 0], 20.0, atol=1e-3)


class TestImplicitFreezeWarning:
    def test_data_change_flags_downstream_rv(self):
        with pm.Model() as model:
            x = pm.Data("x", 0.0)
            beta = pm.Normal("beta", mu=x, sigma=1)
            pm.Normal("obs", beta, 1e-6, observed=0.0)
            idata = _fake_idata(model, {"beta": np.ones((1, 10))})

            # nothing changed: no warning
            with pm.Model():
                pass
            import warnings as _w

            with _w.catch_warnings():
                _w.simplefilter("error", ImplicitFreezeWarning)
                pm.sample_posterior_predictive(
                    idata, return_inferencedata=False, progressbar=False,
                    random_seed=0,
                )

            pm.set_data({"x": 5.0})

            with pytest.warns(
                ImplicitFreezeWarning, match="implicitly frozen"
            ) as rec:
                ppc = pm.sample_posterior_predictive(
                    idata, return_inferencedata=False, progressbar=False,
                    random_seed=0,
                )
            assert any(
                "upstream Data/coords changed" in str(r.message) for r in rec
            )
            np.testing.assert_allclose(ppc["obs"], 1.0, atol=1e-3)

            # explicit freeze: same values, no warning
            with _w.catch_warnings():
                _w.simplefilter("error", ImplicitFreezeWarning)
                ppc_frozen = pm.sample_posterior_predictive(
                    idata, freeze_vars=["beta"],
                    return_inferencedata=False, progressbar=False,
                    random_seed=0,
                )
            np.testing.assert_allclose(ppc_frozen["obs"], 1.0, atol=1e-3)

            # explicit resample: no warning either
            with _w.catch_warnings():
                _w.simplefilter("error", ImplicitFreezeWarning)
                pm.sample_posterior_predictive(
                    idata, sample_vars=["beta"],
                    return_inferencedata=False, progressbar=False,
                    random_seed=0,
                )


class TestDefaultOutputs:
    def test_observed_dependent_deterministics_in_default(self):
        # reference forward.py observed_dependent_deterministics: the
        # default output set is observed RVs + deterministics of them
        with pm.Model() as model:
            mu = pm.Normal("mu")
            obs = pm.Normal("obs", mu, 1, observed=np.zeros(4))
            pm.Deterministic("obs_sum", obs.sum())
            pm.Deterministic("mu_sq", mu**2)  # NOT observed-dependent
            idata = _fake_idata(model, {"mu": np.zeros((1, 5))})
            ppc = pm.sample_posterior_predictive(
                idata, return_inferencedata=False, progressbar=False,
                random_seed=0,
            )
        assert set(ppc) == {"obs", "obs_sum"}
        np.testing.assert_allclose(
            ppc["obs_sum"], ppc["obs"].sum(-1), rtol=1e-6
        )
