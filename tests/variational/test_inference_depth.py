"""VI inference depth battery.

Ports the case inventory of reference tests/variational/test_inference.py
(fit_with_nans:40, fit_oo:182, fit_start:191, fit_fn_text:236, profile:253,
replacements:276, sample_replacements:313, var_replacement:341,
fit_data_coords:441, TestUntransformedData state contracts:519) against
this project's own oracles — no reference code is used.
"""

import numpy as np
import pytest

import pymc_tpu as pm
from pymc_tpu.variational import ADVI, ASVGD, SVGD, FullRankADVI, VIState


@pytest.fixture
def simple_model():
    """Conjugate normal-mean model: posterior mu | y is N(mu_post, 1/d)."""
    n = 1000
    sigma0 = 2.0
    mu0 = 4.0
    sigma = 3.0
    mu = -5.0
    rng = np.random.default_rng(42)
    data = sigma * rng.standard_normal(n) + mu
    d = n / sigma**2 + 1 / sigma0**2
    mu_post = (n * np.mean(data) / sigma**2 + mu0 / sigma0**2) / d
    with pm.Model() as model:
        mu_ = pm.Normal("mu", mu=mu0, sigma=sigma0)
        pm.Normal("x", mu=mu_, sigma=sigma, observed=data)
    model._oracle = {"mu_post": mu_post, "d": d}
    return model


class TestFitOO:
    """reference test_fit_oo: each family recovers the conjugate posterior."""

    @pytest.mark.parametrize(
        "cls,kw,n,tol_sd",
        [
            (ADVI, {}, 5000, 0.2),
            (FullRankADVI, {}, 5000, 0.2),
            (SVGD, {"n_particles": 300}, 2000, 0.3),
        ],
    )
    def test_fit_oo(self, simple_model, cls, kw, n, tol_sd):
        with simple_model:
            inference = cls(random_seed=11, **kw)
            lr = 0.2 if cls is SVGD else 0.1
            approx = inference.fit(
                n, progressbar=False, obj_optimizer=pm.adam(learning_rate=lr)
            )
            trace = approx.sample(10000, random_seed=12)
        mu_post = simple_model._oracle["mu_post"]
        d = simple_model._oracle["d"]
        np.testing.assert_allclose(
            np.mean(trace.posterior["mu"].values), mu_post, rtol=0.05
        )
        np.testing.assert_allclose(
            np.std(trace.posterior["mu"].values), np.sqrt(1.0 / d), rtol=tol_sd
        )


class TestFitStart:
    """reference test_fit_start: start/start_sigma are respected at n=0."""

    @pytest.mark.parametrize("cls", [ADVI, FullRankADVI, SVGD])
    def test_start_mean(self, simple_model, cls):
        mu_init = 17.0
        with simple_model:
            inference = cls(start={"mu": mu_init}, random_seed=7)
            trace = inference.fit(0, progressbar=False).sample(
                10000, random_seed=8
            )
        np.testing.assert_allclose(
            np.mean(trace.posterior["mu"].values), mu_init, rtol=0.05
        )

    def test_start_sigma_advi(self, simple_model):
        mu_init, mu_sigma_init = 17.0, 13.0
        with simple_model:
            inference = ADVI(
                start={"mu": mu_init}, start_sigma={"mu": mu_sigma_init},
                random_seed=7,
            )
            trace = inference.fit(0, progressbar=False).sample(
                20000, random_seed=8
            )
        np.testing.assert_allclose(
            np.mean(trace.posterior["mu"].values), mu_init, rtol=0.05
        )
        np.testing.assert_allclose(
            np.std(trace.posterior["mu"].values), mu_sigma_init, rtol=0.05
        )

    def test_partial_start_merges_initial_point(self):
        """A start dict naming ONE of several free RVs keeps the others at
        the model initial point (reference merges with ipoint)."""
        with pm.Model():
            pm.Normal("a", 3.0, 1.0)
            pm.Normal("b", -2.0, 1.0)
            inference = ADVI(start={"a": 10.0}, random_seed=3)
            trace = inference.fit(0, progressbar=False).sample(
                5000, random_seed=4
            )
        np.testing.assert_allclose(
            np.mean(trace.posterior["a"].values), 10.0, atol=0.05
        )
        np.testing.assert_allclose(
            np.mean(trace.posterior["b"].values), -2.0, atol=0.05
        )

    def test_unknown_start_name_raises(self, simple_model):
        with simple_model:
            with pytest.raises(KeyError, match="unknown"):
                ADVI(start={"nope": 1.0})

    def test_asvgd_rejects_start(self, simple_model):
        with simple_model:
            with pytest.warns(UserWarning, match="experimental"):
                with pytest.raises(TypeError, match="start"):
                    ASVGD(start={})


@pytest.mark.parametrize(
    ["method", "kwargs", "error"],
    [
        ("undefined", {}, KeyError),
        (1, {}, TypeError),
        ("advi", {"total_grad_norm_constraint": 10}, None),
        ("fullrank_advi", {}, None),
        ("svgd", {"total_grad_norm_constraint": 10}, None),
        ("svgd", {"start": {}}, None),
        ("asvgd", {"start": {}, "total_grad_norm_constraint": 10}, TypeError),
        ("asvgd", {"total_grad_norm_constraint": 10}, None),
        ("nfvi=bad-formula", {"start": {}}, KeyError),
    ],
)
def test_fit_fn_text(method, kwargs, error):
    """reference test_fit_fn_text: the string-method registry contract."""
    import warnings

    with pm.Model():
        pm.Normal("mu", 0, 1)
        pm.HalfNormal("sd", 1)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", UserWarning)
            if error is not None:
                with pytest.raises(error):
                    pm.fit(10, method=method, progressbar=False, **kwargs)
            else:
                pm.fit(10, method=method, progressbar=False, **kwargs)


def test_fit_with_nans():
    """reference test_fit_with_nans: a NaN learning rate raises
    FloatingPointError instead of silently poisoning the params."""
    X_mean = np.linspace(0, 10, 10)
    rng = np.random.default_rng(0)
    y = rng.normal(X_mean * 4, 0.05)
    with pm.Model():
        inp = pm.Normal("X", X_mean, 1.0, shape=X_mean.shape)
        coef = pm.Normal("b", 4.0, 1.0)
        pm.Normal("y", inp * coef, 0.1, observed=y)
        with pytest.raises(FloatingPointError):
            pm.fit(
                100, progressbar=False,
                obj_optimizer=pm.adam(learning_rate=float("nan")),
            )


def test_profile(simple_model):
    """reference test_profile: run_profiling(n).summary() works and does
    not mutate the inference state."""
    import io

    with simple_model:
        inference = ADVI(random_seed=5)
        before = np.asarray(inference.params["mu"]).copy()
        buf = io.StringIO()
        inference.run_profiling(n=100).summary(stream=buf)
        assert "per-iteration" in buf.getvalue()
        np.testing.assert_array_equal(np.asarray(inference.params["mu"]), before)


class TestSampleNode:
    """reference test_replacements / test_sample_replacements /
    test_var_replacement: sampling arbitrary model expressions under q."""

    @pytest.fixture
    def binomial_inference(self):
        with pm.Model() as model:
            p = pm.Beta("p", 1.0, 1.0)
            pm.Binomial("xs", n=1, p=p, observed=np.array([0, 1, 1, 0, 1]))
            inference = ADVI(random_seed=21)
            approx = inference.fit(
                200, progressbar=False,
                obj_optimizer=pm.adam(learning_rate=5e-2),
            )
        model._p = p
        return model, approx

    def test_stochastic_and_deterministic(self, binomial_inference):
        model, approx = binomial_inference
        p_t = model._p ** 3
        sampled = [float(approx.sample_node(p_t)) for _ in range(20)]
        assert any(a != b for a, b in zip(sampled[1:], sampled[:-1]))
        dets = [
            float(approx.sample_node(p_t, deterministic=True))
            for _ in range(5)
        ]
        assert all(a == b for a, b in zip(dets[1:], dets[:-1]))
        # deterministic value = expression at the posterior-median point
        assert 0.0 < dets[0] < 1.0

    def test_size(self, binomial_inference):
        model, approx = binomial_inference
        p_t = model._p ** 3
        z = approx.sample_node(p_t, size=10)
        assert z.shape == (10,)
        assert len(np.unique(np.asarray(z))) > 1
        z = approx.sample_node(p_t, deterministic=True, size=10)
        assert z.shape == (10,)
        assert len(np.unique(np.asarray(z))) == 1
        z = approx.sample_node(p_t, size=101)
        assert z.shape == (101,)

    def test_seeded_reproducible(self, binomial_inference):
        _, approx = binomial_inference
        model, _ = binomial_inference
        a = approx.sample_node(model._p, size=7, random_seed=99)
        b = approx.sample_node(model._p, size=7, random_seed=99)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_more_replacements_resizes_data(self):
        """reference test_var_replacement: swapping the data node through
        more_replacements changes downstream shapes."""
        X_mean = np.linspace(0, 10, 10)
        rng = np.random.default_rng(1)
        y = rng.normal(X_mean * 4, 0.05)
        with pm.Model():
            x = pm.Data("x", X_mean)
            coef = pm.Normal("b", 4.0, 1.0)
            mean = x * coef
            pm.Normal("y", mean, 0.1, observed=y, shape=x.shape)
            advi = pm.fit(100, progressbar=False,
                          obj_optimizer=pm.adam(learning_rate=1e-2))
        out = advi.sample_node(mean)
        assert np.shape(out) == (10,)
        x_new = np.linspace(0, 10, 11)
        out = advi.sample_node(mean, more_replacements={x: x_new})
        assert np.shape(out) == (11,)


class TestFittedState:
    """reference TestUntransformedData + test_fit_data_coords."""

    def _model(self):
        rng = np.random.default_rng(42)
        with pm.Model() as m:
            pm.HalfNormal("sigma", sigma=5.0)
            pm.Normal("mu", 0, 1)
            pm.Normal("y", 0.0, 1.0, observed=rng.normal(size=3))
        return m

    def test_state_mean_field(self):
        with self._model():
            fitted = pm.fit(100, method="advi", progressbar=False,
                            random_seed=42)
        s = fitted.state
        assert isinstance(s, VIState)
        assert set(s.mean.keys()) == {"sigma", "mu"}
        assert set(s.std.keys()) == {"sigma", "mu"}
        assert float(s.mean["sigma"].values) > 0
        assert float(s.std["sigma"].values) > 0

    def test_state_full_rank(self):
        with self._model():
            fitted = pm.fit(100, method="fullrank_advi", progressbar=False,
                            random_seed=42)
        s = fitted.state
        assert set(s.mean.keys()) == {"sigma", "mu"}
        assert s.std is not None
        assert float(s.mean["sigma"].values) > 0

    def test_state_empirical_std_is_none(self):
        rng = np.random.default_rng(42)
        with pm.Model():
            pm.Normal("mu", 0, 1)
            pm.Normal("y", 0.0, 1.0, observed=rng.normal(size=10))
            fitted = SVGD(n_particles=50, random_seed=42).fit(
                100, progressbar=False
            )
        s = fitted.state
        assert s.std is None
        assert "mu" in s.mean

    def test_state_in_callback(self):
        snapshots = []

        def callback(approx, losses, i):
            s = approx.state
            snapshots.append(float(s.mean["mu"].values))

        with pm.Model():
            pm.Normal("mu", 0, 1)
            pm.fit(300, progressbar=False, callbacks=[callback],
                   random_seed=1)
        assert len(snapshots) >= 3
        assert all(np.isfinite(v) for v in snapshots)

    def test_mean_std_data_keys_and_coords(self):
        """reference test_fit_data_coords: transformed names + model dims."""
        coords = {"group": ["a", "b", "c"]}
        rng = np.random.default_rng(0)
        with pm.Model(coords=coords):
            pm.Normal("group_mu", 0, 1, dims="group")
            pm.HalfNormal("sigma", 1.0)
            pm.Normal("mu", 0, 1)
            pm.Normal("y", 0.0, 1.0, observed=rng.normal(size=3))
            fitted = pm.fit(1, progressbar=False, random_seed=3)
        for data in [fitted.mean_data, fitted.std_data]:
            assert set(data.keys()) == {"sigma_log__", "group_mu", "mu"}
            assert data["group_mu"].shape == (3,)
            assert list(data["group_mu"].coords.keys()) == ["group"]
            assert data["mu"].shape == ()

    def test_mean_data_matches_conjugate_posterior(self, simple_model):
        with simple_model:
            fitted = pm.fit(
                5000, progressbar=False, random_seed=2,
                obj_optimizer=pm.adam(learning_rate=1e-1),
            )
        np.testing.assert_allclose(
            float(fitted.mean_data["mu"].values),
            simple_model._oracle["mu_post"], rtol=0.05,
        )

    def test_state_include_transformed(self):
        with self._model():
            fitted = pm.fit(10, progressbar=False, random_seed=4)
        fitted.include_transformed = True
        s = fitted.state
        assert "sigma_log__" in s.mean
        assert "sigma" in s.mean


def test_total_grad_norm_constraint_clips():
    """The constraint bounds the per-step parameter motion under sgd."""
    with pm.Model():
        pm.Normal("mu", 0, 1e-4)  # huge gradients away from 0
        inf = ADVI(start={"mu": 5.0}, total_grad_norm_constraint=1.0,
                   random_seed=6)
        before = float(np.asarray(inf.params["mu"])[0])
        approx = inf.fit(1, progressbar=False,
                         obj_optimizer=pm.sgd(learning_rate=1.0))
    after = float(np.asarray(approx.params["mu"])[0])
    # |update| = lr * |clipped grad| <= 1.0 (vs ~5e8 unclipped)
    assert abs(after - before) <= 1.0 + 1e-6
