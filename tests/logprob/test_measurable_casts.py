"""Measurable dtype casts of RV expressions.

Mirrors reference tests/logprob/test_tensor.py TestCastLogp
(test_float_to_float, test_discrete_to_float, test_bool_to_int,
test_float_to_int, test_rounded_float_to_int,
test_non_truncating_discretizing_cast_not_measurable,
test_indirect_discrete_to_float_not_measurable) and
pymc/logprob/tensor.py find_measurable_casts:468-530: casts to a
same-or-wider dtype kind are measure-preserving relabels; float->signed-int
is truncation toward zero; other narrowing casts (unsigned wraparound, bool
collapse) have no derived density; a float cast of a discrete variable is
only measurable when directly valued.
"""

import numpy as np
import jax
import pytest
import scipy.stats as st

import pymc_tpu as pm
from pymc_tpu import math as pmm


class TestFloatToFloat:
    def test_directly_valued_relabel(self):
        with pm.Model():
            x = pm.Normal("x", 1.0, 2.0)
        e = x.astype("float32")
        np.testing.assert_allclose(
            float(pm.logp(e, 0.3)), st.norm.logpdf(0.3, 1.0, 2.0), rtol=1e-6
        )
        np.testing.assert_allclose(
            float(pm.logcdf(e, 0.3)), st.norm.logcdf(0.3, 1.0, 2.0), rtol=1e-6
        )

    def test_transparent_mid_chain(self):
        with pm.Model():
            x = pm.Normal("x", 0.0, 1.0)
        e = 2.0 * x.astype("float64") + 1.0
        np.testing.assert_allclose(
            float(pm.logp(e, 0.5)), st.norm.logpdf(0.5, 1.0, 2.0), rtol=1e-6
        )

    def test_icdf_carries_dtype(self):
        with pm.Model():
            x = pm.Normal("x")
        q = np.asarray(pm.icdf(x.astype("float32"), 0.75))
        assert q.dtype == np.float32
        np.testing.assert_allclose(float(q), st.norm.ppf(0.75), rtol=1e-5)


class TestDiscreteToFloat:
    def test_directly_valued(self):
        """Reference test_discrete_to_float: the logp value passes through
        AS IS (casting it back could map impossible values onto possible
        ones)."""
        with pm.Model():
            x = pm.Poisson("x", mu=3.0)
        e = x.astype("float64")
        np.testing.assert_allclose(
            float(pm.logp(e, 2.0)), st.poisson.logpmf(2, 3.0), rtol=1e-6
        )

    def test_cdf_floors_fractional_values(self):
        """P(cast(X) <= 2.5) = P(X <= 2)."""
        with pm.Model():
            x = pm.Poisson("x", mu=3.0)
        e = x.astype("float64")
        np.testing.assert_allclose(
            float(pm.logcdf(e, 2.5)), st.poisson.logcdf(2, 3.0), rtol=1e-6
        )

    def test_indirect_not_measurable(self):
        """Reference test_indirect_discrete_to_float_not_measurable: a
        transform over the float-cast discrete would wrongly apply a
        continuous Jacobian."""
        with pm.Model():
            x = pm.Poisson("x", mu=3.0)
        with pytest.raises(TypeError, match="directly-valued cast"):
            pm.logp(2.0 * x.astype("float64"), 4.0)

    def test_bool_style_widening_mid_chain(self):
        """Reference test_bool_to_int analogue: widening an integer kind
        mid-chain is measure-preserving (the shifted density survives)."""
        with pm.Model():
            b = pm.Bernoulli("b", p=0.3)
        e = b.astype("int32") + 5
        np.testing.assert_allclose(
            float(pm.logp(e, 6.0)), np.log(0.3), rtol=1e-6
        )
        np.testing.assert_allclose(
            float(pm.logp(e, 5.0)), np.log(0.7), rtol=1e-6
        )


class TestFloatToInt:
    @pytest.mark.parametrize("value", [1.0, 0.0, -1.0])
    def test_truncation_toward_zero(self, value):
        """Reference test_float_to_int: int(x) truncates toward zero, so
        P(cast = k) integrates the cell [k, k+1) for k>=0 and (k-1, k] ...
        (-2, -1] for k=-1 — i.e. the trunc cells."""
        with pm.Model():
            x = pm.Normal("x", 0.0, 1.0)
        e = x.astype("int64")
        lp = float(pm.logp(e, value))
        if value >= 1.0:
            expected = np.log(st.norm.cdf(value + 1) - st.norm.cdf(value))
        elif value == 0.0:
            # trunc maps (-1, 1) -> 0
            expected = np.log(st.norm.cdf(1) - st.norm.cdf(-1))
        else:
            expected = np.log(st.norm.cdf(value) - st.norm.cdf(value - 1))
        np.testing.assert_allclose(lp, expected, rtol=1e-6)

    def test_rounded_float_to_int(self):
        """Reference test_rounded_float_to_int: the cast of an already
        rounded base only relabels the dtype."""
        with pm.Model():
            x = pm.Normal("x", 0.0, 1.0)
        e = pmm.floor(x).astype("int64")
        np.testing.assert_allclose(
            float(pm.logp(e, 1.0)),
            np.log(st.norm.cdf(2) - st.norm.cdf(1)),
            rtol=1e-6,
        )

    def test_int_cast_of_censored_rejected(self):
        with pm.Model():
            x = pm.Normal("x")
        with pytest.raises(TypeError, match="censor"):
            pm.logp(pmm.clip(x, -1.0, 1.0).astype("int64"), 0.0)


class TestNotMeasurable:
    def test_float_to_unsigned_rejected(self):
        """Unsigned ints wrap negative values (-2.7 -> 254 for uint8)."""
        with pm.Model():
            x = pm.Normal("x")
        with pytest.raises(TypeError, match="no derived density"):
            pm.logp(x.astype("uint8"), 1.0)

    def test_to_bool_rejected(self):
        """bool tests x != 0 — collapses the support onto two points."""
        with pm.Model():
            x = pm.Poisson("x", mu=2.0)
        with pytest.raises(TypeError, match="no derived density"):
            pm.logp(x.astype("bool"), 1.0)

    def test_complex_rejected(self):
        with pm.Model():
            x = pm.Normal("x")
        with pytest.raises(TypeError, match="dtype kind"):
            pm.logp(x.astype("complex64"), 1.0)


class TestForward:
    def test_sampling_dtype_and_stats(self):
        with pm.Model():
            x = pm.Poisson("x", mu=3.0)
        from pymc_tpu.distributions.transformed import dist_from_expression

        d = dist_from_expression(x.astype("float64"))
        draws = np.asarray(d.sample(jax.random.PRNGKey(0), (2000,)))
        assert np.issubdtype(draws.dtype, np.floating)
        assert abs(draws.mean() - 3.0) < 0.15
