"""The pymc_tpu.testing harness itself (reference pymc/testing.py parity)."""
import numpy as np

import pymc_tpu as pm
import pymc_tpu.testing as T


def test_check_logccdf_normal():
    from scipy import stats as st

    T.check_logccdf(
        pm.Normal, T.R, {"mu": T.R, "sigma": T.Rplus},
        lambda v, mu, sigma: st.norm.logsf(v, mu, sigma), n_samples=20,
    )


def test_icdf_selfconsistency_gamma():
    T.check_selfconsistency_icdf(
        pm.Gamma, {"alpha": T.Rplusbig, "beta": T.Rplusbig}, n_samples=10
    )


def test_domain_builders():
    assert np.asarray(list(T.Vector(T.R, 3))[0]).shape == (3,)
    assert np.asarray(list(T.RealMatrix(2, 4))[0]).shape == (2, 4)
    v = np.asarray(list(T.UnitSortedVector(5))[0])
    assert (np.diff(v) >= 0).all() and (v >= 0).all() and (v <= 1).all()
    ms = list(T.MultiSimplex(2, 2))
    assert np.allclose(np.asarray(ms[0]).sum(axis=-1), 1.0)
    assert (np.linalg.eigvalsh(T.RandomPdMatrix(4)) > 0).all()


def test_build_model_and_invalid_params():
    m = T.build_model(pm.Normal, T.R, {"mu": T.R, "sigma": T.Rplus})
    assert np.isfinite(m.compile_logp()(m.initial_point()))
    inv = T.find_invalid_scalar_params({"sigma": T.Rplus, "mu": T.R})
    assert inv["sigma"][0] is not None  # below 0 is invalid
    assert inv["mu"] == (None, None)  # unbounded


def test_base_test_distribution_random():
    class TestNormalDraws(T.BaseTestDistributionRandom):
        pymc_dist = pm.Normal
        pymc_dist_params = {"mu": 1.0, "sigma": 2.0}
        expected_rv_op_params = {"mu": 1.0, "sigma": 2.0}
        checks_to_run = ["check_pymc_params_match_rv_op", "check_rv_size"]

    TestNormalDraws().test_all_checks()
