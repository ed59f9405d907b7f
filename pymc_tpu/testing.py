"""Public testing library.

Parity: reference pymc/testing.py (Domain:91, product:68, check_logp:311,
check_logcdf:420, check_icdf:655, check_selfconsistency...:754,791,
assert_support_point_is_expected:837, continuous_random_tester:867). The
scipy-as-oracle contract is identical; the runtime differs: invalid
parameters yield -inf logp (XLA cannot raise the reference's
ParameterValueError) and out-of-support values yield -inf.
"""

from __future__ import annotations

import functools
import itertools

import numpy as np
import jax
import jax.numpy as jnp

import pymc_tpu as pm

__all__ = [
    "Domain",
    "product",
    "R", "Rplus", "Rplusbig", "Rminusbig", "Rbig", "Unit", "SortedVector",
    "Simplex", "Nat", "NatSmall", "Bool", "posint", "Circ", "Runif",
    "Rplusunif", "I",
    "check_logp",
    "check_logcdf",
    "check_icdf",
    "check_selfconsistency_discrete_logcdf",
    "check_support_point",
    "assert_support_point_is_expected",
    "continuous_random_tester",
    "discrete_random_tester",
    "select_by_precision",
]


def select_by_precision(float64, float32):
    """Tolerance by active precision (reference testing.py:234)."""
    return float64 if jax.config.jax_enable_x64 else float32


class Domain:
    """A test domain: a list of values; first/last are edges (excluded from
    interior testing, used for boundary checks). Reference testing.py:91."""

    def __init__(self, vals, dtype="float64", edges=None, shape=None):
        self.vals = list(vals)
        self.dtype = dtype
        if edges is None:
            edges = (self.vals[0], self.vals[-1])
            interior = self.vals[1:-1]
        else:
            interior = list(self.vals)
        self.lower, self.upper = edges
        self.interior_vals = interior
        self.shape = shape

    def __mul__(self, other):
        return Domain(
            [np.asarray(v) * other for v in self.vals],
            self.dtype,
            edges=(
                None if self.lower is None else self.lower * other,
                None if self.upper is None else self.upper * other,
            ),
        )

    def __add__(self, other):
        return Domain(
            [np.asarray(v) + other for v in self.vals],
            self.dtype,
            edges=(
                None if self.lower is None else self.lower + other,
                None if self.upper is None else self.upper + other,
            ),
        )

    def __neg__(self):
        return Domain(
            [-np.asarray(v) for v in self.vals],
            self.dtype,
            edges=(
                None if self.upper is None else -self.upper,
                None if self.lower is None else -self.lower,
            ),
        )

    def __iter__(self):
        return iter(self.interior_vals)


def product(domains: dict, n_samples=-1):
    """Cartesian product over interior values of named domains
    (reference testing.py:68)."""
    names = list(domains.keys())
    all_vals = [list(domains[k]) for k in names]
    combos = list(itertools.product(*all_vals))
    if 0 < n_samples < len(combos):
        rng = np.random.default_rng(42)
        idx = rng.choice(len(combos), n_samples, replace=False)
        combos = [combos[i] for i in idx]
    return [dict(zip(names, c)) for c in combos]


_inf = np.inf
R = Domain([-_inf, -2.1, -1, -0.01, 0.0, 0.01, 1, 2.1, _inf])
Rplus = Domain([0, 0.01, 0.1, 0.9, 0.99, 1, 1.5, 2, 100, _inf])
Rplusbig = Domain([0, 0.5, 0.9, 0.99, 1, 1.5, 2, 20, _inf])
Rminusbig = Domain([-_inf, -2, -1.5, -1, -0.99, -0.9, -0.5, -0.01, 0])
Rbig = Domain([-_inf, -2, -1.5, -1, -0.99, -0.9, -0.5, -0.01, 0.5, 0.9, 0.99, 1, 1.5, 2, _inf])
Unit = Domain([0, 0.001, 0.1, 0.5, 0.75, 0.99, 1])
Runif = Domain([-_inf, -0.4, 0, 0.4, _inf])
Rplusunif = Domain([0, 0.5, _inf])
Circ = Domain([-np.pi, -2.1, -1, -0.01, 0.0, 0.01, 1, 2.1, np.pi])
Nat = Domain([0, 1, 2, 3, _inf], dtype="int64")
NatSmall = Domain([0, 3, 4, 5, _inf], dtype="int64")
Bool = Domain([-_inf, 0, 0, 1, _inf], dtype="int64")
posint = Domain([1, 2, 3, 4, _inf], dtype="int64")
I = Domain([-_inf, -3, -2, -1, 0, 1, 2, 3, _inf], dtype="int64")
SortedVector = lambda n: Domain(  # noqa: E731
    [np.sort(np.random.default_rng(7).normal(size=n)) for _ in range(4)],
    edges=(None, None),
)
Simplex = lambda n: Domain(  # noqa: E731
    [np.random.default_rng(8).dirichlet(np.ones(n)) for _ in range(4)],
    edges=(None, None),
)


def _build_dist(dist_cls, params):
    return dist_cls.dist(**params)


def check_logp(
    dist_cls,
    domain,
    paramdomains,
    scipy_logp,
    decimal=None,
    n_samples=100,
    extra_args=None,
    skip_paramdomain_outside_edge_test=False,
    compare_finite_only=False,
):
    """Compare dist logp against the scipy oracle over the cartesian
    parameter/value grid; assert -inf outside value support and -inf (our
    ParameterValueError analogue) outside parameter support
    (reference testing.py:311-419).

    compare_finite_only: only compare where the scipy value is finite — for
    distributions where scipy's implementation underflows to -inf in deep
    tails while ours stays analytic (e.g. Moyal, Rice)."""
    if decimal is None:
        decimal = select_by_precision(6, 3)
    for params in product(paramdomains, n_samples):
        d = _build_dist(dist_cls, {**params, **(extra_args or {})})
        values = np.asarray(list(domain), dtype=np.float64)
        ours = np.asarray(jax.device_get(pm.logp(d, values)))
        expected = np.asarray(
            [scipy_logp(v, **params) for v in values], dtype=np.float64
        )
        if compare_finite_only:
            keep = np.isfinite(expected)
            ours, expected = ours[keep], expected[keep]
        np.testing.assert_allclose(
            ours,
            expected,
            rtol=10.0 ** -decimal,
            atol=10.0 ** -decimal,
            err_msg=f"{dist_cls.__name__} logp mismatch at params {params}",
        )
        # outside value support -> -inf
        edge_vals = []
        if domain.lower is not None and np.isfinite(domain.lower):
            edge_vals.append(domain.lower - 1.0)
        if domain.upper is not None and np.isfinite(domain.upper):
            edge_vals.append(domain.upper + 1.0)
        if edge_vals:
            out = np.asarray(jax.device_get(pm.logp(d, np.asarray(edge_vals))))
            assert np.all(out == -np.inf), (
                f"{dist_cls.__name__}: expected -inf outside support, got {out}"
            )

    if not skip_paramdomain_outside_edge_test:
        # invalid params -> -inf (reference raises ParameterValueError)
        valid = product(paramdomains, 1)[0]
        test_value = list(domain)[len(list(domain)) // 2]
        for pname, pdomain in paramdomains.items():
            for bad, shift in ((pdomain.lower, -1.0), (pdomain.upper, 1.0)):
                if bad is None or not np.isfinite(bad):
                    continue
                bad_params = {**valid, pname: np.asarray(bad) + shift}
                d = _build_dist(dist_cls, {**bad_params, **(extra_args or {})})
                res = np.asarray(jax.device_get(pm.logp(d, test_value)))
                assert np.all(~np.isfinite(res)), (
                    f"{dist_cls.__name__}: expected non-finite logp for "
                    f"invalid {pname}={bad_params[pname]}, got {res}"
                )


def check_logcdf(
    dist_cls, domain, paramdomains, scipy_logcdf, decimal=None, n_samples=100,
    extra_args=None, skip_paramdomain_outside_edge_test=False,
):
    """Reference testing.py:420."""
    if decimal is None:
        decimal = select_by_precision(6, 3)
    for params in product(paramdomains, n_samples):
        d = _build_dist(dist_cls, {**params, **(extra_args or {})})
        values = np.asarray(list(domain), dtype=np.float64)
        ours = np.asarray(jax.device_get(pm.logcdf(d, values)))
        expected = np.asarray(
            [scipy_logcdf(v, **params) for v in values], dtype=np.float64
        )
        np.testing.assert_allclose(
            ours,
            expected,
            rtol=10.0 ** -decimal,
            atol=10.0 ** -decimal,
            err_msg=f"{dist_cls.__name__} logcdf mismatch at params {params}",
        )
        # below support -> -inf; above -> 0
        if domain.lower is not None and np.isfinite(domain.lower):
            below = np.asarray(
                jax.device_get(pm.logcdf(d, np.asarray(domain.lower) - 1.0))
            )
            assert np.all(below == -np.inf)


def check_icdf(
    dist_cls, paramdomains, scipy_icdf, decimal=None, n_samples=100,
    skip_paramdomain_outside_edge_test=False,
):
    """Reference testing.py:655. Also asserts icdf(q) is nan for q outside
    [0, 1]."""
    if decimal is None:
        decimal = select_by_precision(6, 3)
    qs = np.array([0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99])
    for params in product(paramdomains, n_samples):
        d = _build_dist(dist_cls, params)
        ours = np.asarray(jax.device_get(pm.icdf(d, qs)))
        expected = np.asarray([scipy_icdf(q, **params) for q in qs])
        np.testing.assert_allclose(
            ours,
            expected,
            rtol=10.0 ** -decimal,
            atol=10.0 ** -decimal,
            err_msg=f"{dist_cls.__name__} icdf mismatch at params {params}",
        )
        bad = np.asarray(jax.device_get(pm.icdf(d, np.array([-0.1, 1.1]))))
        assert np.all(np.isnan(bad)), f"expected nan icdf outside [0,1], got {bad}"


def check_selfconsistency_discrete_logcdf(
    dist_cls, domain, paramdomains, decimal=None, n_samples=30
):
    """logcdf(k) == logsumexp(logp(0..k)) (reference testing.py:754)."""
    if decimal is None:
        decimal = select_by_precision(6, 3)
    from scipy.special import logsumexp

    for params in product(paramdomains, n_samples):
        d = _build_dist(dist_cls, params)
        for value in domain:
            if not np.isfinite(value):
                continue
            value = int(value)
            ks = np.arange(0, value + 1)
            logps = np.asarray(jax.device_get(pm.logp(d, ks)))
            ours = float(np.asarray(jax.device_get(pm.logcdf(d, value))))
            np.testing.assert_allclose(
                ours,
                logsumexp(logps),
                rtol=10.0 ** -decimal,
                atol=10.0 ** -decimal,
                err_msg=f"{dist_cls.__name__} cdf!=sum(pmf) at {params}, k={value}",
            )


def check_support_point(dist_cls, paramdomains, n_samples=20):
    """support_point is finite, correctly shaped, and has finite logp
    (reference assert_support_point_is_expected:837)."""
    for params in product(paramdomains, n_samples):
        d = _build_dist(dist_cls, params)
        pt = np.asarray(jax.device_get(d.support_point()))
        assert pt.shape == d.shape, (
            f"{dist_cls.__name__} support_point shape {pt.shape} != {d.shape}"
        )
        assert np.all(np.isfinite(pt)), f"non-finite support point {pt} at {params}"
        lp = np.asarray(jax.device_get(pm.logp(d, pt)))
        assert np.all(np.isfinite(lp)), (
            f"{dist_cls.__name__} support_point has non-finite logp at {params}: "
            f"point={pt} logp={lp}"
        )


def assert_support_point_is_expected(model, expected, check_finite_logp=True):
    pt = model.initial_point()
    rv = model.free_RVs[0]
    v = pt[rv.value_name]
    if rv.transform is not None:
        v = rv.transform.backward(v)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(v)), expected, rtol=1e-5
    )
    if check_finite_logp:
        lp = model.compile_logp()(model.initial_point())
        assert np.isfinite(np.asarray(jax.device_get(lp)))


def continuous_random_tester(
    dist_cls, paramdomains, ref_cdf, size=2000, alpha=0.01, n_samples=5,
    extra_args=None,
):
    """KS test of draws against the scipy reference CDF
    (reference testing.py:867)."""
    from scipy import stats as st

    for i, params in enumerate(product(paramdomains, n_samples)):
        d = dist_cls.dist(**{**params, **(extra_args or {})}, size=(size,))
        draws = np.asarray(jax.device_get(d.sample(jax.random.PRNGKey(100 + i))))
        _, pval = st.kstest(draws, lambda x: ref_cdf(x, **params))
        assert pval > alpha, (
            f"{dist_cls.__name__} KS test failed at {params}: p={pval}"
        )


def discrete_random_tester(
    dist_cls, paramdomains, ref_logpmf, support_fn, size=4000, alpha=0.01,
    n_samples=5,
):
    """Chi-squared test of draws against the reference pmf."""
    from scipy import stats as st

    for i, params in enumerate(product(paramdomains, n_samples)):
        d = dist_cls.dist(**params, size=(size,))
        draws = np.asarray(jax.device_get(d.sample(jax.random.PRNGKey(200 + i))))
        ks = support_fn(**params)
        probs = np.exp([ref_logpmf(k, **params) for k in ks])
        probs = np.append(probs, max(1.0 - probs.sum(), 0.0))
        counts = np.array([(draws == k).sum() for k in ks])
        counts = np.append(counts, size - counts.sum())
        keep = probs * size >= 5
        keep[-1] = keep[-1] and probs[-1] > 0
        if keep.sum() < 2:
            continue
        chi2, pval = st.chisquare(
            counts[keep], probs[keep] / probs[keep].sum() * counts[keep].sum()
        )
        assert pval > alpha, (
            f"{dist_cls.__name__} chi2 test failed at {params}: p={pval}"
        )


def mock_sample(draws=500, *, model=None, chains=1, random_seed=None, **kwargs):
    """Replace pm.sample with prior-predictive draws so downstream model code
    can be tested without MCMC (reference testing.py:1200 mock_sample)."""
    model = pm.modelcontext(model)
    idata = pm.sample_prior_predictive(
        draws=draws, model=model, random_seed=random_seed
    )
    from pymc_tpu.backends.arviz import to_inference_data
    from pymc_tpu.backends.inference_data import InferenceData

    posterior = {}
    for name in idata.prior.keys():
        vals = idata.prior[name].values  # (1, draws, ...)
        posterior[name] = np.broadcast_to(
            vals, (chains,) + vals.shape[1:]
        ).copy()
    return to_inference_data(model, posterior=posterior)


def mock_sample_setup_and_teardown():
    """Context manager patching pm.sample -> mock_sample (reference
    testing.py:1301)."""
    import contextlib

    @contextlib.contextmanager
    def ctx():
        orig = pm.sample
        pm.sample = mock_sample
        try:
            yield
        finally:
            pm.sample = orig

    return ctx()


# --------------------------------------------------------------------------
# Sampler statistical fixtures (reference tests/sampler_fixtures.py)
class KnownMean:
    """Mixin asserting posterior means (reference sampler_fixtures.py:27)."""

    def test_mean(self):
        for var, expected in self.means.items():
            samples = self.samples[var]
            npt = np.testing
            npt.assert_allclose(samples.mean(axis=(0, 1)), expected,
                                atol=self.atol)


class KnownVariance:
    def test_var(self):
        for var, expected in self.variances.items():
            np.testing.assert_allclose(
                self.samples[var].var(axis=(0, 1)), expected, atol=self.atol
            )


class KnownCDF:
    """KS test against a known marginal CDF."""

    def test_kstest(self):
        from scipy import stats as st

        for var, cdf in self.cdfs.items():
            flat = self.samples[var].reshape(-1)
            _, pval = st.kstest(flat[::7], cdf)
            assert pval > 0.001, f"{var} KS p={pval}"


class BaseSampler:
    """Run chains once per class, gate on ESS and R-hat
    (reference sampler_fixtures.py:137-172)."""

    draws = 1000
    tune = 1000
    chains = 2
    min_ess = 200
    rhat_tol = 0.05
    atol = 0.05
    random_seed = 20260816
    step = None

    @classmethod
    def setup_class(cls):
        cls.model = cls.make_model()
        cls.idata = pm.sample(
            draws=cls.draws, tune=cls.tune, chains=cls.chains,
            model=cls.model, random_seed=cls.random_seed, step=cls.step,
            progressbar=False, compute_convergence_checks=False,
        )
        cls.samples = {
            k: cls.idata.posterior[k].values for k in cls.idata.posterior.keys()
        }

    def test_neff(self):
        for var, vals in self.samples.items():
            if not np.issubdtype(vals.dtype, np.floating):
                continue
            e = pm.ess(vals)
            assert np.nanmin(e) > self.min_ess, f"{var} ess={np.nanmin(e)}"

    def test_rhat(self):
        for var, vals in self.samples.items():
            if not np.issubdtype(vals.dtype, np.floating):
                continue
            r = pm.rhat(vals)
            assert np.nanmax(np.abs(r - 1)) < self.rhat_tol, f"{var} rhat={r}"


class NutsFixture(BaseSampler):
    """NUTS acceptance-band check (reference sampler_fixtures.py:174)."""

    target_accept = 0.8

    def test_target_accept(self):
        accept = self.idata.sample_stats["acceptance_rate"].values
        assert accept.mean() > self.target_accept - 0.12, accept.mean()


# --------------------------------------------------------------------------
# additional reference-parity helpers (reference testing.py)

def Vector(d, n):
    """Domain of n-vectors whose entries range over domain d."""
    return Domain([np.stack([np.asarray(v, dtype=float)] * n) for v in d],
                  edges=(None, None), shape=(n,))


def RealMatrix(n, m):
    rng = np.random.default_rng(9)
    return Domain([rng.normal(size=(n, m)) for _ in range(4)],
                  edges=(None, None), shape=(n, m))


def UnitSortedVector(n):
    rng = np.random.default_rng(10)
    return Domain([np.sort(rng.uniform(size=n)) for _ in range(4)],
                  edges=(None, None), shape=(n,))


def simplex_values(n):
    """All (coarse) grid points on the n-simplex (reference testing.py)."""
    if n == 1:
        yield np.array([1.0])
    else:
        for v in Unit.vals:
            for vals in simplex_values(n - 1):
                yield np.concatenate([[v], (1 - v) * vals])


def MultiSimplex(n_dependent, n_independent):
    vals = []
    for simplex_value in itertools.product(
        simplex_values(n_dependent), repeat=n_independent
    ):
        vals.append(np.vstack(simplex_value))
    return Domain(vals, edges=(None, None),
                  shape=(n_independent, n_dependent))


def ProductDomain(domains):
    """Stack several domains along a leading axis."""
    vals = [np.stack(tup) for tup in zip(*[list(d.vals) for d in domains])]
    return Domain(vals, edges=(None, None))


def RandomPdMatrix(n, seed=14):
    """A random symmetric positive-definite matrix."""
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, n))
    return A @ A.T + n * np.eye(n)


def build_model(distfam, valuedomain, vardomains, extra_args=None):
    """Model with one RV of `distfam` whose params are the domain edges'
    midpoint (reference testing.py build_model)."""
    from .model.core import Model

    param_vals = {k: np.asarray(list(v)[0]) for k, v in vardomains.items()}
    param_vals.update(extra_args or {})
    with Model() as m:
        distfam("value", **param_vals)
    return m


def seeded_scipy_distribution_builder(dist_name):
    import scipy.stats as st

    return lambda self, size=None: functools.partial(
        getattr(st, dist_name).rvs, size=size, random_state=20160911
    )


def seeded_numpy_distribution_builder(dist_name):
    return lambda self, size=None: functools.partial(
        getattr(np.random.default_rng(20160911), dist_name), size=size
    )


def find_invalid_scalar_params(paramdomains):
    """{param: (below-lower, above-upper)} invalid scalar probes, None where
    a domain edge is unbounded (reference testing.py)."""
    out = {}
    for name, dom in paramdomains.items():
        lo, hi = dom.lower, dom.upper
        below = None
        above = None
        if lo is not None and np.all(np.isfinite(lo)):
            below = np.asarray(lo) - 1
        if hi is not None and np.all(np.isfinite(hi)):
            above = np.asarray(hi) + 1
        out[name] = (below, above)
    return out


def create_dist_from_paramdomains(dist_cls, paramdomains, extra_args=None):
    """Unnamed dist with each param at its domain's first interior value."""
    params = {k: np.asarray(list(v)[0]) for k, v in paramdomains.items()}
    params.update(extra_args or {})
    return dist_cls.dist(**params)


def check_logccdf(dist_cls, domain, paramdomains, scipy_logccdf,
                  decimal=None, n_samples=100):
    """logccdf contract test against a scipy oracle (reference
    check_logcdf's complementary twin)."""
    if decimal is None:
        decimal = select_by_precision(6, 3)
    for case in product(paramdomains, n_samples=n_samples):
        d = _build_dist(dist_cls, case)
        for v in domain:
            got = float(np.asarray(d.logccdf(np.asarray(v))))
            want = float(scipy_logccdf(np.asarray(v), **case))
            np.testing.assert_almost_equal(
                got, want, decimal=decimal,
                err_msg=f"{dist_cls.__name__} logccdf at {case}, v={v}",
            )


def check_selfconsistency_icdf(dist_cls, paramdomains, n_samples=50,
                               decimal=None):
    """icdf(cdf(x)) == x on random draws (reference
    check_icdf_selfconsistency)."""
    if decimal is None:
        decimal = select_by_precision(6, 3)
    import jax as _jax

    for i, case in enumerate(product(paramdomains, n_samples=n_samples)):
        d = _build_dist(dist_cls, case)
        x = d.sample(_jax.random.PRNGKey(i), sample_shape=(7,))
        q = np.exp(np.asarray(d.logcdf(x)))
        q = np.clip(q, 1e-6, 1 - 1e-6)
        x2 = np.asarray(d.icdf(jnp.asarray(q)))
        x_cycle = np.exp(np.asarray(d.logcdf(jnp.asarray(x2))))
        np.testing.assert_almost_equal(
            x_cycle, q, decimal=decimal,
            err_msg=f"{dist_cls.__name__} icdf∘cdf at {case}",
        )


class BaseTestDistributionRandom:
    """Class-based random-draw contract harness (reference testing.py:
    BaseTestDistributionRandom). Subclass and set:

    pymc_dist, pymc_dist_params, expected_rv_op_params (canonicalized
    params), reference_dist / reference_dist_params, checks_to_run.
    """

    pymc_dist = None
    pymc_dist_params = None
    expected_rv_op_params = None
    reference_dist = None
    reference_dist_params = None
    size = (15,)
    decimal = 6
    checks_to_run = []

    def test_all_checks(self):
        for check_name in self.checks_to_run:
            getattr(self, check_name)()

    def check_pymc_params_match_rv_op(self):
        d = self.pymc_dist.dist(**self.pymc_dist_params)
        for name, expected in self.expected_rv_op_params.items():
            got = getattr(d, name)
            np.testing.assert_almost_equal(
                np.asarray(got), np.asarray(expected), decimal=self.decimal
            )

    def check_pymc_draws_match_reference(self):
        import jax as _jax

        d = self.pymc_dist.dist(**self.pymc_dist_params, size=self.size)
        draws = np.asarray(d.sample(_jax.random.PRNGKey(0)))

        ref = self.reference_dist()(size=self.size,
                                    **(self.reference_dist_params or {}))
        # distributional agreement: compare mean/std loosely
        np.testing.assert_allclose(
            draws.mean(), np.asarray(ref).mean(),
            rtol=0.5, atol=0.5,
        )

    def check_rv_size(self):
        for size, expected in [(None, ()), ((5,), (5,)), ((4, 5), (4, 5))]:
            d = self.pymc_dist.dist(**self.pymc_dist_params, size=size)
            import jax as _jax

            draws = np.asarray(d.sample(_jax.random.PRNGKey(1)))
            assert draws.shape[: len(expected)] == expected


__all__ += [
    "Vector", "RealMatrix", "UnitSortedVector", "simplex_values",
    "MultiSimplex", "ProductDomain", "RandomPdMatrix", "build_model",
    "seeded_scipy_distribution_builder", "seeded_numpy_distribution_builder",
    "find_invalid_scalar_params", "create_dist_from_paramdomains",
    "check_logccdf", "check_selfconsistency_icdf",
    "BaseTestDistributionRandom",
]
