"""Live progress feedback (reference progress_bar/progress.py stat columns)."""

import logging

import numpy as np
import pytest

import pymc_tpu as pm
from pymc_tpu.sampling.progress import ProgressManager


class TestProgressManager:
    def test_phases_and_fields(self):
        pmgr = ProgressManager(100, 4, tune=50, enabled=True)
        pmgr.update_warmup(25, step_size=0.5, depth=3.0, accept=0.8)
        pmgr.update_warmup(25, step_size=0.6, depth=2.5, accept=0.82)
        assert pmgr.tune_done == 50
        pmgr.update(60, divergences=2, step_size=0.55, depth=2.0, accept=0.9)
        pmgr.update(40, divergences=1)
        assert pmgr.done == 100
        assert pmgr.divergences == 3
        pmgr.close()

    def test_fields_formatting(self):
        f = ProgressManager._fields(3, 0.123456, 2.75, 0.912)
        assert f == {"div": 3, "step": "0.123", "depth": "2.8", "acc": "0.91"}
        f = ProgressManager._fields()
        assert f == {"div": "-", "step": "-", "depth": "-", "acc": "-"}

    def test_disabled_is_noop(self):
        pmgr = ProgressManager(10, 2, tune=10, enabled=False)
        pmgr.update_warmup(10)
        pmgr.update(10)
        pmgr.close()


class TestLiveSampleFeedback:
    def test_warmup_and_sampling_stats_logged(self, caplog):
        rng = np.random.default_rng(0)
        y = rng.normal(0.0, 1.0, 30)
        with pm.Model() as m:
            mu = pm.Normal("mu", 0, 5)
            pm.Normal("y", mu, 1.0, observed=y)
        with caplog.at_level(logging.INFO, logger="pymc_tpu"):
            pm.sample(draws=100, tune=100, chains=2, model=m, random_seed=0,
                      progressbar=True, compute_convergence_checks=False,
                      chunk_size=50)
        text = caplog.text
        assert "Warmup:" in text            # live warmup feedback exists
        assert "step=" in text and "depth=" in text and "acc=" in text
        assert "Sampling: 100/100" in text
