"""Transform depth battery porting the reference case inventory
(reference tests/distributions/test_transform.py: domain round trips,
autodiff jacobian oracles, per-family transformed-vs-untransformed logp
equality across sizes, ordered/chained variants, Cholesky cov/corr transform
contracts, and the rejection matrix). Oracles are built independently:
log|det J| is checked against jax.jacobian + slogdet of the full backward
map, never against pinned reference constants.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import pymc_tpu as pm
import pymc_tpu.distributions.transforms as tr

rng = np.random.default_rng(42)


def autodiff_ljd_elementwise(t, v):
    """Oracle log|det dbackward/dv| for an elementwise transform."""
    g = jax.vmap(jax.grad(lambda u: t.backward(u)))(jnp.ravel(jnp.asarray(v)))
    return np.log(np.abs(np.asarray(g))).reshape(np.shape(v))


def autodiff_ljd_vector(t, v):
    """Oracle log|det J| of the full backward map for a 1-D value vector.

    If backward changes the length (simplex), project onto the free
    coordinates (drop the last output entry) so the Jacobian is square.
    """
    v = jnp.asarray(v, dtype=jnp.float64)

    def back_free(u):
        x = t.backward(u)
        return x[: u.shape[0]]

    J = jax.jacobian(back_free)(v)
    sign, ld = np.linalg.slogdet(np.asarray(J))
    return ld


ELEMENTWISE_TRANSFORMS = [
    (tr.log, np.array([-2.0, -0.5, 0.0, 1.3, 3.0])),
    (tr.logodds, np.array([-4.0, -1.0, 0.0, 0.5, 4.0])),
    (tr.log_exp_m1, np.array([-3.0, -0.5, 0.0, 1.5, 4.0])),
    (tr.IntervalTransform(-4.0, 5.5), np.array([-3.0, 0.0, 2.5])),
    (tr.IntervalTransform(0.1, 0.7), np.array([-2.0, 0.0, 1.0])),
    (tr.IntervalTransform(0.0, None), np.array([-2.0, 0.0, 3.0])),
    (tr.IntervalTransform(None, 0.0), np.array([-2.0, 0.0, 3.0])),
]


class TestDomainsAndJacobians:
    """check_transform + check_jacobian_det analogs with autodiff oracles."""

    @pytest.mark.parametrize("t,v", ELEMENTWISE_TRANSFORMS,
                             ids=lambda p: getattr(p, "name", None) or "v")
    def test_elementwise_roundtrip_and_ljd(self, t, v):
        x = np.asarray(t.backward(v))
        np.testing.assert_allclose(np.asarray(t.forward(x)), v, atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(t.log_jac_det(v)), autodiff_ljd_elementwise(t, v),
            atol=1e-9,
        )

    def test_lowerbound_image_positive(self):
        t = tr.IntervalTransform(0.0, None)
        vals = np.asarray(t.backward(np.linspace(-10, 5, 50)))
        assert (vals > 0).all()

    def test_upperbound_image_negative(self):
        t = tr.IntervalTransform(None, 0.0)
        vals = np.asarray(t.backward(np.linspace(-10, 5, 50)))
        assert (vals < 0).all()

    @pytest.mark.parametrize("a,b", [(-4, 5.5), (0.1, 0.7), (-10, 4.3)])
    def test_interval_image_in_bounds(self, a, b):
        t = tr.IntervalTransform(float(a), float(b))
        vals = np.asarray(t.backward(np.linspace(-20, 20, 101)))
        assert (vals > a).all() and (vals < b).all()

    def test_circular_image_and_ljd(self):
        t = tr.circular
        vals = np.asarray(t.backward(np.linspace(-9, 9, 101)))
        assert (vals >= -np.pi).all() and (vals <= np.pi).all()
        np.testing.assert_allclose(
            np.asarray(t.log_jac_det(np.array([0.1, 2.0]))), 0.0
        )
        # roundtrip within the principal branch
        x = np.array([-3.0, -0.4, 0.0, 1.2, 3.0])
        np.testing.assert_allclose(
            np.asarray(t.backward(t.forward(x))), x, atol=1e-12
        )

    @pytest.mark.parametrize(
        "t",
        [
            tr.ordered,
            tr.OrderedTransform(positive=True),
            tr.OrderedTransform(positive=True, ascending=False),
        ],
        ids=["plain", "positive", "positive-descending"],
    )
    def test_ordered_variants(self, t):
        v = np.array([0.3, -0.7, 0.4, 0.1])
        x = np.asarray(t.backward(v))
        d = np.diff(x)
        if t.ascending:
            assert (d >= 0).all()
        else:
            assert (d <= 0).all()
        if t.positive:
            assert (x > 0).all()
        np.testing.assert_allclose(np.asarray(t.forward(x)), v, atol=1e-10)
        # full-jacobian oracle (ordered is NOT elementwise)
        np.testing.assert_allclose(
            float(t.log_jac_det(v)), autodiff_ljd_vector(t, v), atol=1e-9
        )

    def test_ordered_descending_forward_backward_inverse(self):
        t = tr.OrderedTransform(positive=True, ascending=False)
        x = np.array([0.3, 0.2, 0.1])
        np.testing.assert_allclose(
            np.asarray(t.backward(t.forward(x))), x, atol=1e-12
        )

    def test_sum_to_1_roundtrip_zero_ljd(self):
        t = tr.sum_to_1
        x = np.array([0.4, -0.2, 0.5, 0.3])
        v = np.asarray(t.forward(x))
        assert v.shape == (3,)
        back = np.asarray(t.backward(v))
        np.testing.assert_allclose(back, x, atol=1e-12)
        np.testing.assert_allclose(back.sum(), 1.0, atol=1e-12)
        assert float(t.log_jac_det(v)) == 0.0

    def test_simplex_ljd_autodiff(self):
        t = tr.simplex
        v = np.array([0.3, -1.2, 0.5])
        x = np.asarray(t.backward(v))
        assert x.shape == (4,)
        np.testing.assert_allclose(x.sum(), 1.0, atol=1e-12)
        assert (x > 0).all()
        np.testing.assert_allclose(
            float(t.log_jac_det(v)), autodiff_ljd_vector(t, v), atol=1e-9
        )

    @pytest.mark.parametrize("n", [3, 5])
    def test_chain_logodds_ordered(self, n):
        t = tr.ChainedTransform([tr.logodds, tr.ordered])
        v = rng.normal(size=n)
        x = np.asarray(t.backward(v))
        assert (np.diff(x) >= 0).all() and (x > 0).all() and (x < 1).all()
        np.testing.assert_allclose(np.asarray(t.forward(x)), v, atol=1e-9)
        np.testing.assert_allclose(
            float(t.log_jac_det(v)), autodiff_ljd_vector(t, v), atol=1e-8
        )

    def test_chain_batched_ljd_keeps_batch(self):
        t = tr.ChainedTransform([tr.logodds, tr.ordered])
        vb = rng.normal(size=(4, 3))
        ljd = np.asarray(t.log_jac_det(vb))
        assert ljd.shape == (4,)
        for i in range(4):
            np.testing.assert_allclose(
                ljd[i], autodiff_ljd_vector(t, vb[i]), atol=1e-8
            )


def _transformed_vs_untransformed(dist_cls, params, shape, transform,
                                  initval=None):
    """Reference check_transform_elementwise_logp: joint logp of the
    transformed model at v equals the untransformed model's logp at
    backward(v) plus the summed log_jac_det."""
    with pm.Model() as mt:
        # default_transform=None: test EXACTLY the given transform (user
        # transform= would otherwise chain on top of the dist default)
        dist_cls("x", shape=shape, transform=transform,
                 default_transform=None, **params)
    rv = mt.free_RVs[0]
    t = rv.transform
    vshape = t.value_shape(rv.dist.shape)
    v = rng.normal(size=vshape) * 0.7
    x = np.asarray(t.backward(jnp.asarray(v)))
    ljd = np.asarray(t.log_jac_det(jnp.asarray(v)))

    lp_t = float(mt.logp_fn()({rv.value_name: jnp.asarray(v)}))
    with pm.Model() as mu:
        dist_cls("x", shape=shape, default_transform=None, **params)
    ru = mu.free_RVs[0]
    lp_u = float(mu.logp_fn()({ru.value_name: jnp.asarray(x)}))
    np.testing.assert_allclose(lp_t, lp_u + ljd.sum(), rtol=1e-8)

    # ndim contract: elementwise transforms keep the value's ndim, vector
    # transforms collapse one axis (reference TestElementWiseLogp asserts)
    terms = mt.logp_terms_fn(elementwise=True)({rv.value_name: jnp.asarray(v)})
    lp_el = terms[rv.name]
    expect_ndim = len(np.shape(v)) - max(
        getattr(t, "event_ndim", 0) - rv.dist.event_ndim, 0
    ) - rv.dist.event_ndim
    assert np.ndim(lp_el) == expect_ndim


class TestElementwiseLogpParity:
    @pytest.mark.parametrize("sigma,shape", [
        (2.5, (2,)), (5.0, (2, 3)), (np.ones(3) * 10.0, (4, 3)),
    ])
    def test_half_normal_log(self, sigma, shape):
        _transformed_vs_untransformed(pm.HalfNormal, {"sigma": sigma},
                                      shape, tr.log)

    @pytest.mark.parametrize("lam,shape", [
        (2.5, (2,)), (5.0, (2, 3)), (np.ones(3), (4, 3)),
    ])
    def test_exponential_log(self, lam, shape):
        _transformed_vs_untransformed(pm.Exponential, {"lam": lam},
                                      shape, tr.log)

    @pytest.mark.parametrize("a,b,shape", [
        (1.0, 1.0, (2,)), (0.5, 0.5, (2, 3)),
        (np.ones(3), np.ones(3), (4, 3)),
    ])
    def test_beta_logodds(self, a, b, shape):
        _transformed_vs_untransformed(pm.Beta, {"alpha": a, "beta": b},
                                      shape, tr.logodds)

    @pytest.mark.parametrize("lower,upper,shape", [
        (0.0, 1.0, (2,)), (0.5, 5.5, (2, 3)),
        (np.zeros(3), np.ones(3), (4, 3)),
    ])
    def test_uniform_interval(self, lower, upper, shape):
        _transformed_vs_untransformed(
            pm.Uniform, {"lower": lower, "upper": upper}, shape,
            tr.IntervalTransform(np.asarray(lower), np.asarray(upper)),
        )

    @pytest.mark.parametrize("lower,c,upper,shape", [
        (0.0, 1.0, 2.0, (2,)), (-10, 0, 200, (2, 3)),
        (np.zeros(3), np.ones(3) * 0.5, np.ones(3), (4, 3)),
    ])
    def test_triangular_interval(self, lower, c, upper, shape):
        _transformed_vs_untransformed(
            pm.Triangular, {"lower": lower, "c": c, "upper": upper}, shape,
            tr.IntervalTransform(np.asarray(lower, dtype=float),
                                 np.asarray(upper, dtype=float)),
        )

    @pytest.mark.parametrize("mu,kappa,shape", [
        (0.0, 1.0, (2,)), (-0.5, 5.5, (2, 3)),
        (np.zeros(3), np.ones(3), (4, 3)),
    ])
    def test_vonmises_circular(self, mu, kappa, shape):
        _transformed_vs_untransformed(
            pm.VonMises, {"mu": mu, "kappa": kappa}, shape, tr.circular
        )

    @pytest.mark.parametrize("a,shape", [
        (np.ones(2), (2,)), (np.ones((2, 3)) * 0.5, (2, 3)),
        (np.ones(3), (4, 3)),
    ])
    def test_dirichlet_simplex(self, a, shape):
        _transformed_vs_untransformed(pm.Dirichlet, {"a": a}, shape,
                                      tr.simplex)

    # ordered-composed chains per family (reference *_ordered rows)
    @pytest.mark.parametrize("dist_cls,params,chain", [
        (pm.Normal, {"mu": 0.0, "sigma": 1.0}, [tr.ordered]),
        (pm.HalfNormal, {"sigma": 2.5}, [tr.log, tr.ordered]),
        (pm.Exponential, {"lam": 2.5}, [tr.log, tr.ordered]),
        (pm.Beta, {"alpha": 1.0, "beta": 1.0}, [tr.logodds, tr.ordered]),
        (pm.Uniform, {"lower": 0.0, "upper": 1.0},
         [tr.IntervalTransform(0.0, 1.0), tr.ordered]),
        (pm.VonMises, {"mu": 0.0, "kappa": 1.0},
         [tr.circular, tr.ordered]),
    ], ids=["normal", "halfnormal", "exponential", "beta", "uniform",
            "vonmises"])
    def test_family_ordered_chain(self, dist_cls, params, chain):
        t = tr.ChainedTransform(chain) if len(chain) > 1 else chain[0]
        _transformed_vs_untransformed(dist_cls, params, (3,), t)

    @pytest.mark.parametrize("transform", [tr.ordered, tr.sum_to_1],
                             ids=["ordered", "sumto1"])
    def test_mvnormal_vector_transform(self, transform):
        mu = np.zeros(3)
        cov = np.eye(3) * 2.0 + 0.3
        _transformed_vs_untransformed(
            pm.MvNormal, {"mu": mu, "cov": cov}, (3,), transform
        )


class TestModelLevelContracts:
    def test_interval_near_boundary_finite(self):
        # reference test_interval_near_boundary: initval one ulp inside the
        # upper bound must produce a finite, correctly-scaled point logp
        lb, ub = -1.0, 1e-7
        x0 = np.nextafter(ub, lb)
        with pm.Model() as m:
            pm.Uniform("x", lower=lb, upper=ub, initval=x0)
        (lp,) = m.point_logps(round_vals=10).values()
        # independent oracle: logp = -log(ub-lb) + log_jac_det(forward(x0))
        v = np.log(x0 - lb) - np.log(ub - x0)
        expected = (
            -np.log(ub - lb)
            + np.log(ub - lb)
            - np.logaddexp(0.0, -v)
            - np.logaddexp(0.0, v)
        )
        assert np.isfinite(lp)
        np.testing.assert_allclose(lp, expected, rtol=1e-6)

    def test_triangular_default_backward_limits(self):
        with pm.Model() as m:
            pm.Triangular("x", lower=0.0, c=1.0, upper=2.0)
        t = m.free_RVs[0].transform
        np.testing.assert_allclose(float(t.backward(-np.inf)), 0.0)
        np.testing.assert_allclose(float(t.backward(np.inf)), 2.0)

    def test_logp_shape_elementwise_vs_ordered(self):
        with pm.Model() as m:
            pm.Uniform("x", shape=(4, 3), default_transform=tr.logodds)
        for jac in (True, False):
            t = m.logp_terms_fn(jacobian=jac, elementwise=True)(
                m.initial_point(0))
            assert np.shape(t["x"]) == (4, 3)
        with pm.Model() as m:
            pm.Uniform("x", shape=(4, 3), default_transform=tr.ordered)
        for jac in (True, False):
            t = m.logp_terms_fn(jacobian=jac, elementwise=True)(
                m.initial_point(0))
            assert np.shape(t["x"]) == (4,)

    def test_interval_both_none_raises(self):
        with pytest.raises(ValueError,
                           match="cannot both be None"):
            tr.IntervalTransform(None, None)

    def test_discrete_transform_raises(self):
        with pm.Model():
            with pytest.raises(ValueError,
                               match="Transformations for discrete"):
                pm.Binomial("a", n=5, p=0.5, transform=tr.log)

    def test_univariate_transform_multivariate_raises(self):
        with pm.Model():
            with pytest.raises(NotImplementedError,
                               match="cannot be applied to multivariate"):
                pm.Dirichlet("x", np.ones(3), default_transform=tr.log)

    def test_invalid_jacobian_broadcast_raises(self):
        class Buggy(tr.Transform):
            name = "buggy"

            def forward(self, x, env=None):
                return x

            def backward(self, v, env=None):
                return v

            def log_jac_det(self, v, env=None):
                return jnp.zeros_like(v.sum(-1, keepdims=True))

        with pm.Model() as m:
            pm.Uniform("x", shape=(4, 3), default_transform=Buggy())
        with pytest.raises(ValueError, match="log_jac_det"):
            m.logp_fn()(m.initial_point(0))

    def test_transform_none_keeps_constrained(self):
        with pm.Model() as m:
            with pytest.warns(UserWarning, match="default_transform=None"):
                pm.HalfNormal("x", transform=None)
        assert m.free_RVs[0].transform is None

    def test_default_transform_none_keeps_constrained(self):
        with pm.Model() as m:
            pm.HalfNormal("x", default_transform=None)
        assert m.free_RVs[0].transform is None

    def test_transform_chains_with_default(self):
        """reference TestTransformArgs.test_transform_order: user transform
        chains ON TOP of the default (list = [default, user])."""
        with pm.Model() as m:
            pm.HalfNormal("x", shape=(3,), transform=tr.ordered)
        t = m.free_RVs[0].transform
        assert isinstance(t, tr.ChainedTransform)
        assert isinstance(t.transforms[0], tr.LogTransform)
        assert isinstance(t.transforms[1], tr.OrderedTransform)

    def test_default_transform_is_applied(self):
        """reference test_default_transform_is_applied: with the default
        kept, a decreasing unconstrained ordered value maps through exp to
        positive support (finite logp); with default_transform=None the
        ordered-only backward can leave the support (logp -inf)."""
        with pm.Model() as m1:
            pm.LogNormal("x1", mu=[0.0, 0.0], sigma=[1.0, 1.0],
                         transform=tr.ordered, default_transform=None)
        with pm.Model() as m2:
            pm.LogNormal("x2", mu=[0.0, 0.0], sigma=[1.0, 1.0],
                         transform=tr.ordered)
        v1 = m1.free_RVs[0].value_name
        v2 = m2.free_RVs[0].value_name
        assert np.isinf(float(m1.compile_logp()({v1: np.array([-1.0, -1.0])})))
        assert np.isfinite(float(m2.compile_logp()({v2: np.array([-1.0, -1.0])})))


class TestCholeskyCovTransform:
    def _vals(self):
        L = np.array([[1.0, 0.0, 0.0], [0.5, 1.5, 0.0], [-0.3, 0.2, 0.8]])
        v = np.array([0.0, 0.5, np.log(1.5), -0.3, 0.2, np.log(0.8)])
        return v, L @ L.T

    def test_forward(self):
        t = tr.CholeskyCovTransform(n=3)
        v, S = self._vals()
        np.testing.assert_allclose(np.asarray(t.forward(S)), v, atol=1e-9)

    def test_backward(self):
        t = tr.CholeskyCovTransform(n=3)
        v, S = self._vals()
        np.testing.assert_allclose(np.asarray(t.backward(v)), S, atol=1e-9)

    def test_roundtrip(self):
        t = tr.CholeskyCovTransform(n=3)
        v, S = self._vals()
        np.testing.assert_allclose(
            np.asarray(t.backward(t.forward(S))), S, atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(t.forward(t.backward(v))), v, atol=1e-9)

    def test_log_jac_det_autodiff(self):
        # Jacobian of the packed lower triangle of Sigma wrt v
        t = tr.CholeskyCovTransform(n=3)
        v, _ = self._vals()
        ri, ci = np.tril_indices(3)

        def packed_sigma(u):
            return t.backward(u)[ri, ci]

        J = jax.jacobian(packed_sigma)(jnp.asarray(v, dtype=jnp.float64))
        _, ld = np.linalg.slogdet(np.asarray(J))
        np.testing.assert_allclose(float(t.log_jac_det(v)), ld, atol=1e-9)

    @pytest.mark.parametrize("n", [3, 5, 10])
    def test_backward_produces_spd(self, n):
        t = tr.CholeskyCovTransform(n=n)
        v = rng.normal(size=(5, n * (n + 1) // 2))
        S = np.asarray(t.backward(jnp.asarray(v)))
        np.testing.assert_allclose(S, np.swapaxes(S, -1, -2), atol=1e-9)
        assert (np.linalg.eigvalsh(S) > 0).all()


class TestCholeskyCorrTransform:
    @pytest.mark.parametrize("n", [3, 5, 10])
    def test_backward_produces_valid_cholesky_corr(self, n):
        t = tr.CholeskyCorrTransform(n=n)
        m = n * (n - 1) // 2
        v = rng.normal(size=(5, m))
        packed = np.asarray(t.backward(jnp.asarray(v)))
        ri, ci = np.tril_indices(n, k=-1)
        L = np.zeros((5, n, n))
        L[:, ri, ci] = packed
        diag = np.sqrt(np.maximum(1.0 - (L ** 2).sum(-1), 0.0))
        L = L + diag[..., None] * np.eye(n)
        C = L @ np.swapaxes(L, -1, -2)
        np.testing.assert_allclose(
            np.diagonal(C, axis1=-2, axis2=-1), 1.0, atol=1e-6)
        assert (C >= -1 - 1e-6).all() and (C <= 1 + 1e-6).all()
        assert (np.linalg.eigvalsh(C) >= -1e-6).all()

    def test_roundtrip(self):
        t = tr.CholeskyCorrTransform(n=4)
        v = rng.normal(size=6)
        np.testing.assert_allclose(
            np.asarray(t.forward(t.backward(jnp.asarray(v)))), v, atol=1e-6)

    def test_log_jac_det_autodiff(self):
        t = tr.CholeskyCorrTransform(n=3)
        v = jnp.asarray(np.array([0.4, -0.3, 0.8]), dtype=jnp.float64)
        J = jax.jacobian(lambda u: t.backward(u))(v)
        _, ld = np.linalg.slogdet(np.asarray(J))
        np.testing.assert_allclose(float(t.log_jac_det(v)), ld, atol=1e-8)


class TestSamplingWithTransforms:
    """Chained / vector transforms must survive an actual NUTS run."""

    def test_sample_chained_ordered_uniform(self):
        # transform=ordered CHAINS with the default interval transform
        # (reference semantics) -> logit then ordered
        with pm.Model() as m:
            pm.Uniform(
                "x", 0, 1, shape=(3,),
                transform=tr.ordered,
                initval=np.array([0.2, 0.5, 0.8]),
            )
            idata = pm.sample(draws=200, tune=200, chains=2, random_seed=0,
                              progressbar=False,
                              compute_convergence_checks=False)
        x = idata.posterior["x"].values
        assert (np.diff(x, axis=-1) >= 0).all()
        assert (x > 0).all() and (x < 1).all()
        # iid uniform conditioned on ordering = uniform order statistics:
        # E[x_(k)] = k/(n+1)
        np.testing.assert_allclose(
            x.mean(axis=(0, 1)), [0.25, 0.5, 0.75], atol=0.05)

    def test_sample_ordered_positive(self):
        with pm.Model() as m:
            pm.HalfNormal(
                "x", sigma=1.0, shape=(3,),
                transform=tr.ordered,
                initval=np.array([0.5, 1.0, 1.5]),
            )
            idata = pm.sample(draws=200, tune=200, chains=2, random_seed=0,
                              progressbar=False,
                              compute_convergence_checks=False)
        x = idata.posterior["x"].values
        assert (np.diff(x, axis=-1) >= 0).all()
        assert (x > 0).all()
