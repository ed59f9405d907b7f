"""Transform contract tests: forward/backward round-trips and log_jac_det
against autodiff (mirrors reference tests/logprob/test_transform_value.py +
tests/distributions/test_transform.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pymc_tpu.distributions import transforms as tr
from pymc_tpu.distributions.multivariate import CorrPackedTransform


def _autodiff_ljd(t, v):
    """log|det d backward/dv| via jacobian (works for shape-preserving and
    shape-changing transforms alike)."""
    v = jnp.asarray(v, jnp.float64)
    J = jax.jacobian(lambda u: jnp.ravel(t.backward(u)))(v)
    J = J.reshape(-1, v.size)
    if J.shape[0] == J.shape[1]:
        return jnp.linalg.slogdet(J)[1]
    # rectangular (embedding): use 0.5*logdet(J^T J)
    return 0.5 * jnp.linalg.slogdet(J.T @ J)[1]


SHAPE_PRESERVING = [
    (tr.log, np.array([0.3, 1.7])),
    (tr.logodds, np.array([-0.5, 1.2])),
    (tr.IntervalTransform(-2.0, 3.0), np.array([-0.7, 0.9])),
    (tr.IntervalTransform(1.0, None), np.array([-0.2, 2.0])),
    (tr.IntervalTransform(None, 5.0), np.array([0.1, -1.0])),
    (tr.log_exp_m1, np.array([-0.3, 1.1])),
    (tr.ordered, np.array([0.1, -0.4, 0.8])),
    (tr.OrderedTransform(positive=True), np.array([-0.5, 0.2, -1.0])),
    (tr.CholeskyCovPackedTransform(2), np.array([0.2, 0.4, -0.1])),
]


class TestRoundTrip:
    @pytest.mark.parametrize("t,v", SHAPE_PRESERVING,
                             ids=lambda x: getattr(x, "name", ""))
    def test_forward_backward(self, t, v):
        x = t.backward(jnp.asarray(v))
        v2 = np.asarray(t.forward(x))
        np.testing.assert_allclose(v2, v, rtol=1e-6, atol=1e-8)

    def test_simplex_roundtrip(self):
        v = jnp.asarray([0.3, -0.5, 0.8])
        x = tr.simplex.backward(v)
        assert abs(float(jnp.sum(x)) - 1.0) < 1e-9
        np.testing.assert_allclose(np.asarray(tr.simplex.forward(x)), v,
                                   rtol=1e-6)

    def test_zerosum_roundtrip(self):
        t = tr.ZeroSumTransform(1)
        v = jnp.asarray([0.4, -1.2, 0.3])
        x = t.backward(v)
        assert abs(float(jnp.sum(x))) < 1e-9
        np.testing.assert_allclose(np.asarray(t.forward(x)), v, rtol=1e-6)

    def test_corr_packed_roundtrip(self):
        t = CorrPackedTransform(3)
        v = jnp.asarray([0.3, -0.2, 0.5])
        x = t.backward(v)
        C = np.zeros((3, 3))
        C[np.tril_indices(3, -1)] = np.asarray(x)
        C = C + C.T + np.eye(3)
        assert np.all(np.linalg.eigvalsh(C) > 0)  # valid correlation matrix
        np.testing.assert_allclose(np.asarray(t.forward(x)), v, rtol=1e-5,
                                   atol=1e-7)


class TestLogJacDet:
    @pytest.mark.parametrize("t,v", SHAPE_PRESERVING,
                             ids=lambda x: getattr(x, "name", ""))
    def test_matches_autodiff(self, t, v):
        ours = float(jnp.sum(jnp.asarray(t.log_jac_det(jnp.asarray(v)))))
        expected = float(_autodiff_ljd(t, v))
        np.testing.assert_allclose(ours, expected, rtol=1e-6)

    def test_simplex_ljd(self):
        v = jnp.asarray([0.3, -0.5, 0.8])
        ours = float(jnp.sum(tr.simplex.log_jac_det(v)))
        # rectangular jacobian of the K-1 -> first K-1 coords map (the last
        # coordinate is determined); use the square sub-jacobian
        J = jax.jacobian(lambda u: tr.simplex.backward(u)[:-1])(
            jnp.asarray(v, jnp.float64)
        )
        expected = float(jnp.linalg.slogdet(J)[1])
        np.testing.assert_allclose(ours, expected, rtol=1e-6)

    def test_chained(self):
        t = tr.ChainedTransform([tr.log])
        v = jnp.asarray([0.5])
        np.testing.assert_allclose(
            float(jnp.sum(jnp.asarray(t.log_jac_det(v)))),
            float(_autodiff_ljd(tr.log, v)), rtol=1e-6,
        )


class TestSamplingInvariance:
    """Posterior must not depend on the chosen parametrization
    (reference change-of-transform contract)."""

    def test_halfnormal_transforms_agree(self):
        import pymc_tpu as pm

        y = np.random.default_rng(0).normal(0, 1.7, 150)
        results = {}
        for name, kw in [
            ("log", {}),
            ("none", {"transform": None}),
            ("interval", {"transform": tr.IntervalTransform(0.0, None)}),
        ]:
            with pm.Model() as m:
                s = pm.HalfNormal("s", 5, **kw)
                pm.Normal("y", 0, s, observed=y)
            idata = pm.sample(draws=500, tune=500, chains=2, model=m,
                              random_seed=1, progressbar=False,
                              compute_convergence_checks=False)
            results[name] = float(idata.posterior["s"].values.mean())
        vals = list(results.values())
        assert max(vals) - min(vals) < 0.08, results


class TestDefaultTransformAssignment:
    """Reference transform-class registry (continuous.py:156-180 +
    per-dist registrations): positive -> log, unit -> logodds,
    circular -> circular, bounded -> interval, simplex dists -> simplex,
    ordered cutpoints unaffected."""

    def _transform_of(self, make):
        import pymc_tpu as pm

        with pm.Model() as m:
            make(pm)
        (rv,) = m.free_RVs
        return rv.transform

    def test_positive_get_log(self):
        import pymc_tpu as pm

        for make in (
            lambda pm: pm.HalfNormal("x", 1.0),
            lambda pm: pm.Gamma("x", 2.0, 1.0),
            lambda pm: pm.Exponential("x", 1.0),
            lambda pm: pm.InverseGamma("x", 3.0, 1.0),
            lambda pm: pm.HalfCauchy("x", 1.0),
            lambda pm: pm.Weibull("x", 2.0, 1.0),
            lambda pm: pm.LogNormal("x", 0.0, 1.0),
        ):
            t = self._transform_of(make)
            assert type(t).__name__ == "LogTransform", (make, t)

    def test_unit_get_logodds(self):
        t = self._transform_of(lambda pm: pm.Beta("x", 2.0, 2.0))
        assert type(t).__name__ == "LogOddsTransform"

    def test_circular(self):
        t = self._transform_of(lambda pm: pm.VonMises("x", 0.0, 1.0))
        assert type(t).__name__ == "CircularTransform"

    def test_bounded_get_interval(self):
        import numpy as np

        t = self._transform_of(lambda pm: pm.Uniform("x", -1.0, 2.0))
        assert type(t).__name__ == "IntervalTransform"
        # bounds baked in: backward maps R into (-1, 2)
        lo = float(np.asarray(t.backward(jnp.asarray(-20.0))))
        hi = float(np.asarray(t.backward(jnp.asarray(20.0))))
        assert -1.0 <= lo < -0.99 and 1.99 < hi <= 2.0

        t2 = self._transform_of(
            lambda pm: pm.TruncatedNormal("x", 0.0, 1.0, lower=0.5)
        )
        assert type(t2).__name__ == "IntervalTransform"

    def test_simplex(self):
        import numpy as np

        t = self._transform_of(
            lambda pm: pm.Dirichlet("x", a=np.array([1.0, 2.0, 3.0]))
        )
        assert type(t).__name__ == "SimplexTransform"

    def test_transform_none_removes(self):
        import pymc_tpu as pm

        with pm.Model() as m:
            pm.HalfNormal("x", 1.0, transform=None)
        assert m.free_RVs[0].transform is None


class TestRemainingTransformJacobians:
    def test_cholesky_corr_ljd_autodiff(self):
        # packed (m,) -> packed (m,) is shape-preserving: exact autodiff check
        t = tr.CholeskyCorrTransform(3)
        v = jnp.asarray([0.3, -0.4, 0.7])
        ours = float(jnp.sum(jnp.asarray(t.log_jac_det(v))))
        expected = float(_autodiff_ljd(t, v))
        np.testing.assert_allclose(ours, expected, rtol=1e-6)

    def test_cholesky_corr_ljd_autodiff_n4(self):
        t = tr.CholeskyCorrTransform(4)
        v = jnp.asarray([0.2, -0.1, 0.5, 0.8, -0.6, 0.05])
        np.testing.assert_allclose(
            float(jnp.sum(jnp.asarray(t.log_jac_det(v)))),
            float(_autodiff_ljd(t, v)), rtol=1e-6,
        )

    def test_zerosum_is_isometry(self):
        # the claimed |det|=1: the rectangular embedding must be orthonormal,
        # i.e. 0.5*logdet(J^T J) == 0 by autodiff
        t = tr.ZeroSumTransform(1)
        v = jnp.asarray([0.4, -1.2, 0.3])
        np.testing.assert_allclose(float(_autodiff_ljd(t, v)), 0.0,
                                   atol=1e-10)
        np.testing.assert_allclose(
            np.asarray(t.log_jac_det(v)), 0.0, atol=1e-12
        )

    def test_circular_ljd_zero(self):
        t = tr.CircularTransform()
        v = jnp.asarray([0.5, 2.9, -2.9])
        np.testing.assert_allclose(
            np.asarray(jnp.sum(jnp.asarray(t.log_jac_det(v)))), 0.0,
            atol=1e-12,
        )
        # backward lands in (-pi, pi]
        x = np.asarray(t.backward(jnp.asarray([7.0, -7.0])))
        assert np.all(x > -np.pi - 1e-9) and np.all(x <= np.pi + 1e-9)

    def test_sum_to_1_ljd_zero_convention(self):
        # the reference's SumTo1 log_jac_det is identically zero (subspace
        # density convention, reference transforms.py SumTo1)
        v = jnp.asarray([0.2, 0.3])
        np.testing.assert_allclose(
            np.asarray(jnp.sum(jnp.asarray(tr.sum_to_1.log_jac_det(v)))),
            0.0, atol=1e-12,
        )
        x = np.asarray(tr.sum_to_1.backward(v))
        np.testing.assert_allclose(x.sum(), 1.0, rtol=1e-12)
