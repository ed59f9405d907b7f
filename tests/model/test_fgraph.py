"""Model <-> graph round-trip + surgery (reference pymc/model/fgraph.py:
fgraph_from_model:139, model_from_fgraph:301, clone_model:387)."""

import numpy as np
import pytest

import pymc_tpu as pm
from pymc_tpu.graph import ConstantNode
from pymc_tpu.model.fgraph import (
    ModelGraph,
    fgraph_from_model,
    model_from_fgraph,
    clone_model,
)


@pytest.fixture
def model():
    with pm.Model(coords={"g": list("ab")}) as m:
        mu = pm.Normal("mu", 0, 5)
        sigma = pm.HalfNormal("sigma", 1)
        pm.Deterministic("two_mu", 2 * mu)
        pm.Normal("y", mu, sigma, observed=np.array([1.0, 2.0, 3.0]))
    return m


class TestRoundTrip:
    def test_identity_roundtrip(self, model):
        fg, memo = fgraph_from_model(model)
        assert isinstance(fg, ModelGraph)
        assert set(memo) >= {"mu", "sigma", "y", "two_mu"}
        new = model_from_fgraph(fg)
        assert new is not model
        assert {rv.name for rv in new.free_RVs} == {"mu", "sigma"}
        # identical logp at the same point
        pt = model.initial_point()
        np.testing.assert_allclose(
            float(new.logp_fn()(pt)), float(model.logp_fn()(pt))
        )

    def test_clone_independence(self, model):
        new = clone_model(model)
        # mutating the clone's registry must not touch the original
        new.deterministics.clear()
        assert len(model.deterministics) == 1

    def test_inspection(self, model):
        fg, _ = fgraph_from_model(model)
        names = {getattr(v, "name", None) for v in fg.variables()}
        assert {"mu", "sigma", "y"} <= names
        assert all(
            not any(hasattr(a, "args") for a in getattr(n, "args", ()))
            or True
            for n in fg.inputs()
        )


class TestSurgery:
    def test_replace_rv_with_constant_is_do(self, model):
        # do-operator via raw graph surgery: pin mu = 3
        fg, memo = fgraph_from_model(model)
        fg.replace(memo["mu"], ConstantNode(np.asarray(3.0)))
        fg.remove("mu")
        new = model_from_fgraph(fg)
        assert {rv.name for rv in new.free_RVs} == {"sigma"}
        # y's mean is now pinned at 3: logp matches a handwritten model
        with pm.Model() as ref:
            s2 = pm.HalfNormal("sigma", 1)
            pm.Normal("y", 3.0, s2, observed=np.array([1.0, 2.0, 3.0]))
        pt = {"sigma_log__": 0.3}
        np.testing.assert_allclose(
            float(new.logp_fn()(pt)), float(ref.logp_fn()(pt))
        )

    def test_remove_deterministic(self, model):
        fg, _ = fgraph_from_model(model)
        fg.remove("two_mu")
        new = model_from_fgraph(fg)
        assert all(d.name != "two_mu" for d in new.deterministics)

    def test_insert_deterministic(self, model):
        fg, memo = fgraph_from_model(model)
        fg.insert_deterministic("mu_sq", memo["mu"] ** 2)
        new = model_from_fgraph(fg)
        assert any(d.name == "mu_sq" for d in new.deterministics)
        idata = pm.sample(draws=40, tune=40, chains=1, model=new,
                          random_seed=0, progressbar=False,
                          compute_convergence_checks=False)
        np.testing.assert_allclose(
            idata.posterior["mu_sq"].values,
            idata.posterior["mu"].values ** 2, rtol=1e-6,
        )

    def test_chained_edits_repr(self, model):
        fg, memo = fgraph_from_model(model)
        fg.replace(memo["mu"], ConstantNode(np.asarray(0.0))).remove("mu")
        assert "edits=2" in repr(fg)


class TestProfile:
    def test_profile_reports_and_traces(self, model, tmp_path):
        rep = model.profile(n=20)
        assert rep["logp_sec_per_call"] > 0
        assert rep["dlogp_sec_per_call"] > 0
        # jax.profiler integration: produces an on-disk device trace
        trace_dir = tmp_path / "jax_trace"
        rep2 = model.profile(n=5, trace_dir=trace_dir)
        assert rep2["n_calls"] == 5
        import os

        found = []
        for root, _, files in os.walk(trace_dir):
            found.extend(files)
        assert found, "jax.profiler.trace produced no trace files"
