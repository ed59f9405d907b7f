"""Extra bijective transforms, folded (non-injective) densities, image
guards, and special-function identities.

Ports the case inventory of reference tests/logprob/test_transforms.py:
test_extra_bijective_rv_transforms, test_monotonically_decreasing_
transform_logcdf, test_monotonic_transform_icdf, test_cosh_rv_transform,
test_absolute_rv_transform, test_negative_value_{odd,even,frac}_power_
transform, test_special_log_exp_transforms, test_measurable_power_exponent_
with_{constant,variable}_base, test_base_exponent_non_measurable. Oracles
are the change-of-variables formulas evaluated with scipy (never reference
code).
"""
import jax
import numpy as np
import pytest
import scipy.stats as st
from scipy.special import erfc as s_erfc, erfcinv as s_erfcinv

import pymc_tpu as pm
import pymc_tpu.math as pmm

MU, SD = 0.5, 1.0


def _base_logp(v):
    return st.norm.logpdf(v, MU, SD)


def _x():
    with pm.Model():
        x = pm.Normal("x", MU, SD)
    return x


# (pm.math fn, backward, log|d backward/dy|, test value)
BIJECTIVE_CASES = {
    "arcsin": (pmm.arcsin, np.sin, lambda y: np.log(np.cos(y)), 0.25),
    "arccos": (pmm.arccos, np.cos, lambda y: np.log(np.sin(y)), 0.25),
    "arctan": (
        pmm.arctan, np.tan, lambda y: -2 * np.log(np.abs(np.cos(y))), 0.25
    ),
    "arcsinh": (pmm.arcsinh, np.sinh, lambda y: np.log(np.cosh(y)), 0.25),
    "arccosh": (pmm.arccosh, np.cosh, lambda y: np.log(np.sinh(y)), 0.25),
    "arctanh": (
        pmm.arctanh, np.tanh, lambda y: np.log1p(-np.tanh(y) ** 2), 0.25
    ),
    "sinh": (
        pmm.sinh, np.arcsinh, lambda y: -0.5 * np.log1p(y * y), 0.25
    ),
    "tanh": (pmm.tanh, np.arctanh, lambda y: -np.log1p(-y * y), 0.25),
    "erf": (
        pmm.erf,
        lambda y: st.norm.ppf((1 + y) / 2) / np.sqrt(2),
        lambda y: 0.5 * np.log(np.pi) - np.log(2)
        + (st.norm.ppf((1 + y) / 2) / np.sqrt(2)) ** 2,
        0.25,
    ),
    "erfc": (
        pmm.erfc,
        lambda y: st.norm.ppf(1 - y / 2) / np.sqrt(2),
        lambda y: 0.5 * np.log(np.pi) - np.log(2)
        + (st.norm.ppf(1 - y / 2) / np.sqrt(2)) ** 2,
        0.25,
    ),
    "erfcinv": (
        pmm.erfcinv,
        s_erfc,
        lambda y: np.log(2 / np.sqrt(np.pi)) - y**2,
        0.25,
    ),
    "log2": (
        pmm.log2,
        lambda y: 2.0**y,
        lambda y: y * np.log(2) + np.log(np.log(2)),
        0.25,
    ),
    "log10": (
        pmm.log10,
        lambda y: 10.0**y,
        lambda y: y * np.log(10) + np.log(np.log(10)),
        0.25,
    ),
    "log1mexp": (
        pmm.log1mexp,
        lambda y: np.log(-np.expm1(y)),
        lambda y: y - np.log(-np.expm1(y)),
        -0.25,
    ),
}


class TestExtraBijective:
    """Reference test_extra_bijective_rv_transforms: logp(f(x), v) equals
    base logp(backward(v)) + log|d backward/dv|."""

    @pytest.mark.parametrize("name", sorted(BIJECTIVE_CASES))
    def test_logp_formula(self, name):
        f, back, ljd, v = BIJECTIVE_CASES[name]
        lp = float(pm.logp(f(_x()), v))
        np.testing.assert_allclose(
            lp, _base_logp(back(v)) + ljd(v), rtol=1e-9
        )

    @pytest.mark.parametrize("name", sorted(BIJECTIVE_CASES))
    def test_cdf_density_consistency(self, name):
        """d/dv exp(logcdf) == exp(logp) by autodiff (skips sign-ambiguous
        ops where the cdf family raises)."""
        f, _, _, v = BIJECTIVE_CASES[name]
        expr = f(_x())

        def cdf(u):
            return pm.logp(expr, u) * 0.0 + jax_exp_logcdf(expr, u)

        def jax_exp_logcdf(e, u):
            import jax.numpy as jnp

            return jnp.exp(pm.logcdf(e, u))

        g = float(jax.grad(lambda u: jax_exp_logcdf(expr, u))(v))
        np.testing.assert_allclose(
            g, np.exp(float(pm.logp(expr, v))), rtol=1e-6
        )


class TestDecreasingCdf:
    """Reference test_monotonically_decreasing_transform_logcdf: for a
    decreasing map, P(Y <= y) = P(X >= backward(y))."""

    @pytest.mark.parametrize("name", ["erfc", "erfcinv", "arccos"])
    def test_logcdf_is_base_logccdf(self, name):
        f, back, _, v = BIJECTIVE_CASES[name]
        lc = float(pm.logcdf(f(_x()), v))
        np.testing.assert_allclose(
            lc, st.norm.logsf(back(v), MU, SD), rtol=1e-9
        )

    @pytest.mark.parametrize(
        "name, decreasing", [("arctan", False), ("erfcinv", True)]
    )
    def test_monotonic_icdf(self, name, decreasing):
        f, back, _, _ = BIJECTIVE_CASES[name]
        q = 0.3
        ic = float(pm.icdf(f(_x()), q))
        base_q = 1 - q if decreasing else q
        if name == "arctan":
            expected = np.arctan(st.norm.ppf(base_q, MU, SD))
        else:
            expected = s_erfcinv(st.norm.ppf(base_q, MU, SD))
        np.testing.assert_allclose(ic, expected, rtol=1e-9)


class TestFoldedAbs:
    """Reference test_absolute_rv_transform."""

    def test_abs_standard_normal_is_halfnormal(self):
        with pm.Model():
            z = pm.Normal("z", 0.0, 1.0)
        for v in (2.5, 0.3):
            np.testing.assert_allclose(
                float(pm.logp(pmm.abs(z), v)),
                st.halfnorm.logpdf(v),
                rtol=1e-9,
            )

    def test_abs_negative_value_neginf(self):
        with pm.Model():
            z = pm.Normal("z", 0.0, 1.0)
        assert np.isneginf(float(pm.logp(pmm.abs(z), -2.5)))

    def test_abs_noncentered_two_branches(self):
        v = 1.25
        lp = float(pm.logp(pmm.abs(_x()), v))
        np.testing.assert_allclose(
            lp, np.logaddexp(_base_logp(-v), _base_logp(v)), rtol=1e-9
        )

    def test_abs_cdf_family_raises(self):
        expr = pmm.abs(_x())
        with pytest.raises(NotImplementedError):
            pm.logcdf(expr, 1.0)
        with pytest.raises(NotImplementedError):
            pm.icdf(expr, 0.5)

    def test_builtin_abs_matches(self):
        x = _x()
        np.testing.assert_allclose(
            float(pm.logp(abs(x), 1.25)),
            float(pm.logp(pmm.abs(x), 1.25)),
        )

    def test_abs_of_inner_chain(self):
        # abs(2 z + 1): fold over an affine chain
        with pm.Model():
            z = pm.Normal("z", 0.0, 1.0)
        v = 0.8
        inner = lambda t: st.norm.logpdf((t - 1) / 2) - np.log(2)  # noqa:E731
        np.testing.assert_allclose(
            float(pm.logp(pmm.abs(2.0 * z + 1.0), v)),
            np.logaddexp(inner(-v), inner(v)),
            rtol=1e-9,
        )

    def test_transform_over_fold(self):
        # exp(abs(z)): outer chain over the folded base
        with pm.Model():
            z = pm.Normal("z", 0.0, 1.0)
        v = 1.7
        np.testing.assert_allclose(
            float(pm.logp(pmm.exp(pmm.abs(z)), v)),
            st.halfnorm.logpdf(np.log(v)) - np.log(v),
            rtol=1e-9,
        )

    def test_abs_discrete_rejected(self):
        with pm.Model():
            k = pm.Poisson("k", 3.0)
        with pytest.raises(TypeError, match="discrete"):
            pm.logp(pmm.abs(k), 2.0)

    def test_abs_multivariate_rejected(self):
        with pm.Model():
            m = pm.MvNormal("m", mu=np.zeros(2), cov=np.eye(2))
        with pytest.raises(TypeError, match="sign combinations"):
            pm.logp(pmm.abs(m), np.ones(2))

    def test_abs_forward_sampling(self):
        from pymc_tpu.distributions.transformed import dist_from_expression

        with pm.Model():
            z = pm.Normal("z", 0.0, 1.0)
        d = dist_from_expression(pmm.abs(z))
        draws = np.asarray(d.sample(jax.random.PRNGKey(0), (4000,)))
        assert draws.min() >= 0
        assert st.kstest(draws, st.halfnorm.cdf).pvalue > 0.01


class TestFoldedPowers:
    """Reference test_negative_value_{odd,even,frac}_power_transform."""

    @pytest.mark.parametrize("power", (-3, -1, 1, 5, 7))
    def test_odd_powers_finite_both_signs(self, power):
        x = _x()
        assert np.isfinite(float(pm.logp(x**power, 1.0)))
        assert np.isfinite(float(pm.logp(x**power, -1.0)))

    @pytest.mark.parametrize("power", (-2, 2, 4, 6, 8))
    def test_even_powers_fold(self, power):
        x = _x()
        assert np.isfinite(float(pm.logp(x**power, 1.0)))
        assert np.isneginf(float(pm.logp(x**power, -1.0)))

    @pytest.mark.parametrize("power", (-1 / 3, -1 / 2, 1 / 2, 1 / 3))
    def test_frac_powers_neginf_at_negative(self, power):
        x = _x()
        assert np.isfinite(float(pm.logp(x**power, 2.5)))
        assert np.isneginf(float(pm.logp(x**power, -2.5)))

    def test_square_standard_normal_is_chisq1(self):
        with pm.Model():
            z = pm.Normal("z", 0.0, 1.0)
        for v in (0.4, 1.7, 5.0):
            np.testing.assert_allclose(
                float(pm.logp(pmm.sqr(z), v)),
                st.chi2.logpdf(v, df=1),
                rtol=1e-9,
            )
            np.testing.assert_allclose(
                float(pm.logp(z**2, v)),
                st.chi2.logpdf(v, df=1),
                rtol=1e-9,
            )

    def test_even_power_two_branch_formula(self):
        v = 1.3
        lp = float(pm.logp(_x() ** 4, v))
        b = v ** (1 / 4)
        ljd = -np.log(4) + (1 / 4 - 1) * np.log(v)
        np.testing.assert_allclose(
            lp, np.logaddexp(_base_logp(-b), _base_logp(b)) + ljd, rtol=1e-9
        )

    def test_negative_even_power(self):
        v = 0.6
        lp = float(pm.logp(_x() ** -2, v))
        b = v ** (-1 / 2)
        ljd = -np.log(2) + (-1 / 2 - 1) * np.log(v)
        np.testing.assert_allclose(
            lp, np.logaddexp(_base_logp(-b), _base_logp(b)) + ljd, rtol=1e-9
        )

    def test_even_power_cdf_raises(self):
        with pytest.raises(NotImplementedError):
            pm.logcdf(_x() ** 2, 1.0)


class TestCoshFold:
    """Reference test_cosh_rv_transform."""

    def test_two_branch_formula(self):
        v = np.array([1.25, 2.5])
        lp = np.asarray(pm.logp(pmm.cosh(_x()), v))
        b = np.arccosh(v)
        expected = np.logaddexp(
            _base_logp(-b), _base_logp(b)
        ) - 0.5 * np.log(v**2 - 1)
        np.testing.assert_allclose(lp, expected, rtol=1e-9)

    def test_below_one_neginf(self):
        assert np.isneginf(float(pm.logp(pmm.cosh(_x()), 0.25)))

    def test_cdf_family_raises(self):
        expr = pmm.cosh(_x())
        with pytest.raises(NotImplementedError):
            pm.logcdf(expr, 2.0)
        with pytest.raises(NotImplementedError):
            pm.icdf(expr, 0.5)


class TestImageGuards:
    """Values outside a transform's image get logp -inf (the reference
    propagates nan -> -inf through CheckParameterValue)."""

    @pytest.mark.parametrize(
        "fn, bad",
        [
            (pmm.exp, -1.0),
            (pmm.sqrt, -1.0),
            (pmm.tanh, 1.5),
            (pmm.tanh, -1.5),
            (pmm.sigmoid, 1.5),
            (pmm.sigmoid, -0.5),
            (pmm.erf, 1.5),
            (pmm.arcsin, 2.0),
            (pmm.arccos, -0.5),
            (pmm.arctan, 2.0),
            (pmm.softplus, -0.5),
            (pmm.expm1, -1.5),
            (pmm.invprobit, 1.5),
            (pmm.log1mexp, 0.5),
        ],
    )
    def test_out_of_image_neginf(self, fn, bad):
        assert np.isneginf(float(pm.logp(fn(_x()), bad)))

    @pytest.mark.parametrize("fn, good", [(pmm.exp, 0.5), (pmm.tanh, 0.3)])
    def test_gradient_finite_at_valid_point(self, fn, good):
        expr = fn(_x())
        g = float(jax.grad(lambda v: pm.logp(expr, v))(good))
        assert np.isfinite(g)


class TestSpecialIdentities:
    """Reference test_special_log_exp_transforms: raw compositions equal
    their canonical special-function forms."""

    def test_log2_raw(self):
        x = pmm.exp(_x())  # positive support
        np.testing.assert_allclose(
            float(pm.logp(pmm.log(x) / np.log(2.0), 0.4)),
            float(pm.logp(pmm.log2(x), 0.4)),
            rtol=1e-9,
        )

    def test_log10_raw(self):
        x = pmm.exp(_x())
        np.testing.assert_allclose(
            float(pm.logp(pmm.log(x) / np.log(10.0), 0.4)),
            float(pm.logp(pmm.log10(x), 0.4)),
            rtol=1e-9,
        )

    def test_log1p_raw(self):
        z = _x()
        np.testing.assert_allclose(
            float(pm.logp(pmm.log(1.0 + z), 0.4)),
            float(pm.logp(pmm.log1p(z), 0.4)),
            rtol=1e-9,
        )

    def test_expm1_raw(self):
        z = _x()
        np.testing.assert_allclose(
            float(pm.logp(pmm.exp(z) - 1.0, 0.4)),
            float(pm.logp(pmm.expm1(z), 0.4)),
            rtol=1e-9,
        )

    def test_softplus_raw(self):
        z = _x()
        np.testing.assert_allclose(
            float(pm.logp(pmm.log(1.0 + pmm.exp(z)), 0.9)),
            float(pm.logp(pmm.softplus(z), 0.9)),
            rtol=1e-9,
        )

    def test_log1mexp_raw(self):
        z = -pmm.exp(_x())  # negative support for log1mexp's domain
        np.testing.assert_allclose(
            float(pm.logp(pmm.log(1.0 - pmm.exp(z)), -0.4)),
            float(pm.logp(pmm.log1mexp(z), -0.4)),
            rtol=1e-9,
        )

    def test_sigmoid_reciprocal_form(self):
        z = _x()
        np.testing.assert_allclose(
            float(pm.logp(1.0 / (1.0 + pmm.exp(-z)), 0.3)),
            float(pm.logp(pmm.sigmoid(z), 0.3)),
            rtol=1e-9,
        )

    def test_sigmoid_odds_ratio_form(self):
        # exp(z)/(1+exp(z)) with the SHARED exp(z) node
        z = _x()
        u = pmm.exp(z)
        np.testing.assert_allclose(
            float(pm.logp(u / (1.0 + u), 0.3)),
            float(pm.logp(pmm.sigmoid(z), 0.3)),
            rtol=1e-9,
        )
        assert np.isneginf(float(pm.logp(u / (1.0 + u), 1.5)))

    def test_exp2_raw(self):
        z = _x()
        v = 0.7
        # 2**z is the constant-base power path
        np.testing.assert_allclose(
            float(pm.logp(2.0**z, v)),
            _base_logp(np.log2(v)) - np.log(v) - np.log(np.log(2.0)),
            rtol=1e-9,
        )


class TestPowerBases:
    """Reference test_measurable_power_exponent_with_{constant,variable}_
    base and test_base_exponent_non_measurable."""

    def test_constant_base_matches_formula(self):
        v = 0.1
        lp = float(pm.logp(2.0 ** _x(), v))
        np.testing.assert_allclose(
            lp,
            _base_logp(np.log(v) / np.log(2)) - np.log(v) - np.log(np.log(2)),
            rtol=1e-9,
        )

    def test_negative_constant_base_rejected(self):
        with pytest.raises(TypeError, match="c > 0"):
            pm.logp((-2.0) ** _x(), 1.5)

    def test_variable_base_conditioned(self):
        with pm.Model():
            b = pm.Normal("b", 2.0, 0.1)
            e = pm.Normal("e", 0.0, 1.0)
        lp = float(pm.logp(b**e, 2.0, env={"b": np.array(2.0)}))
        expected = (
            st.norm.logpdf(1.0) - np.log(2.0) - np.log(np.log(2.0))
        )
        np.testing.assert_allclose(lp, expected, rtol=1e-9)

    def test_variable_base_negative_neginf(self):
        # the reference raises ParameterValueError("base >= 0"); our
        # convention is logp -inf on invalid params (XLA cannot raise)
        with pm.Model():
            b = pm.Normal("b", 2.0, 0.1)
            e = pm.Normal("e", 0.0, 1.0)
        assert np.isneginf(
            float(pm.logp(b**e, 2.0, env={"b": np.array(-2.0)}))
        )

    def test_both_random_rejected(self):
        with pm.Model():
            b = pm.Normal("b", 2.0, 0.1)
            e = pm.Normal("e", 0.0, 1.0)
        with pytest.raises(TypeError, match="one random operand"):
            pm.logp(b**e, 2.0)
