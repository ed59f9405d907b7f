"""Model-graph depth battery.

Ports the reference tests/test_model_graph.py behaviors that define the
graph's SEMANTICS (not its rendering): parent/edge structure from the
compute graph, plate grouping by dims/shape, imputation-model node splits,
var_names subgraph selection with parents, and deterministic/potential
node kinds across all three exporters.
"""

import numpy as np
import pytest

import pymc_tpu as pm
from pymc_tpu.exceptions import ImputationWarning
from pymc_tpu.model_graph import ModelGraph


@pytest.fixture(scope="module")
def radon_model():
    rng = np.random.default_rng(0)
    county = rng.integers(0, 3, size=20)
    x = rng.normal(size=20)
    y = rng.normal(size=20)
    with pm.Model(coords={"county": list("ABC"), "obs": range(20)}) as model:
        mu_a = pm.Normal("mu_a", 0, 1)
        sd_a = pm.HalfNormal("sd_a", 1)
        a = pm.Normal("a", mu_a, sd_a, dims="county")
        beta = pm.Normal("beta", 0, 1)
        eps = pm.HalfNormal("eps", 1)
        data_x = pm.Data("data_x", x, dims="obs")
        theta = pm.Deterministic("theta", a[county] + beta * data_x, dims="obs")
        pm.Normal("y", theta, eps, observed=y, dims="obs")
    return model


class TestEdges:
    def test_compute_graph_edges(self, radon_model):
        mg = ModelGraph(radon_model)
        edges = set(mg.edges())
        # hyperpriors feed the group effects
        assert ("mu_a", "a") in edges
        assert ("sd_a", "a") in edges
        # deterministic gets its parents; the likelihood gets the
        # deterministic and the noise
        assert ("a", "theta") in edges
        assert ("beta", "theta") in edges
        assert ("data_x", "theta") in edges
        assert ("theta", "y") in edges
        assert ("eps", "y") in edges
        # no spurious reverse edges
        assert ("y", "theta") not in edges
        assert ("a", "y") not in edges  # mediated through theta

    def test_node_kinds(self, radon_model):
        mg = ModelGraph(radon_model)
        kinds = {name: mg.node_kind(v) for name, v in
                 radon_model.named_vars.items()}
        assert kinds["mu_a"] == "free"
        assert kinds["y"] == "observed"
        assert kinds["theta"] == "deterministic"
        assert kinds["data_x"] == "data"


class TestPlates:
    def test_plate_grouping(self, radon_model):
        mg = ModelGraph(radon_model)
        plates = mg.plates()
        # scalar plate holds the hyperpriors
        flat = {}
        for label, names in plates.items():
            for n in names:
                flat[n] = label
        assert flat["mu_a"] == flat["sd_a"] == flat["beta"]
        # county plate holds `a`; obs plate holds theta/y/data_x
        assert flat["a"] != flat["mu_a"]
        assert "county" in flat["a"] or "3" in flat["a"]
        assert flat["theta"] == flat["y"]
        assert "obs" in flat["y"] or "20" in flat["y"]


class TestVarNamesSelection:
    def test_subgraph_keeps_parents(self, radon_model):
        g = pm.model_to_graphviz(radon_model, var_names=["a"])
        src = g.source if hasattr(g, "source") else str(g)
        assert "a" in src
        # parents included
        assert "mu_a" in src and "sd_a" in src
        # unrelated vars excluded
        assert "eps" not in src

    def test_all_exporters_agree_on_nodes(self, radon_model):
        names = set(radon_model.named_vars)
        gv = pm.model_to_graphviz(radon_model)
        src = gv.source if hasattr(gv, "source") else str(gv)
        mm = pm.model_to_mermaid(radon_model)
        G = pm.model_to_networkx(radon_model)
        for n in names:
            assert n in src
            assert n in mm
        assert names <= set(G.nodes)


class TestImputationGraph:
    def test_imputed_model_nodes(self):
        with pm.Model() as model:
            mu = pm.Normal("mu", 0, 1)
            with pytest.warns(ImputationWarning):
                pm.Normal("x", mu, 1, observed=np.array([0.1, np.nan, 0.4]))
        mg = ModelGraph(model)
        names = set(model.named_vars)
        assert {"x", "x_observed", "x_unobserved"} <= names
        edges = set(mg.edges())
        assert ("mu", "x_unobserved") in edges or ("mu", "x_observed") in edges
        # the combined deterministic joins both components
        assert ("x_unobserved", "x") in edges
        assert ("x_observed", "x") in edges
        # renders without error
        pm.model_to_mermaid(model)
        pm.model_to_networkx(model)


class TestPotentialNode:
    def test_potential_in_graph(self):
        with pm.Model() as model:
            x = pm.Normal("x", 0, 1)
            pm.Potential("pot", -0.5 * x**2)
        mg = ModelGraph(model)
        assert ("x", "pot") in set(mg.edges())
        G = pm.model_to_networkx(model)
        assert "pot" in set(G.nodes)


def test_none_dim_in_plate():
    """Partially-dimmed variables still plate correctly (reference
    test_issue_6335_dims_containing_none)."""
    with pm.Model(coords={"c": range(3)}) as model:
        x = pm.Normal("x", np.zeros((2, 3)), dims=(None, "c"))
    mg = ModelGraph(model)
    plates = mg.plates()
    (label,) = [lb for lb, names in plates.items() if "x" in names]
    assert "c" in label or "3" in label
    pm.model_to_graphviz(model)
