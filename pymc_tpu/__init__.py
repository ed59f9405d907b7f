"""pymc_tpu — a TPU-native probabilistic programming framework.

Re-designed from scratch for JAX/XLA/Pallas with the capability surface of
PyMC (reference layout: pymc/__init__.py:49-65). The model's joint logp+grad
compiles to ONE fused XLA program; chains are a vmapped/sharded array axis;
adaptation, NUTS tree-doubling, VI and SMC all run on-device.
"""

__version__ = "0.1.0"

import logging


def _tune_allocator():
    """Keep large freed blocks in the heap instead of munmapping them.

    glibc services >128 KB allocations with mmap and returns them to the OS
    on free, so every large numpy temporary (FFT buffers, transposes, trace
    packaging) pays first-touch page faults again — on small-vCPU VMs that
    is ~10 MB/ms, dominating ESS/R-hat postprocessing wall time (measured
    here: repeated 170 MB alloc+copy 24.5 s cold vs 0.2 s warm). Raising
    M_MMAP_THRESHOLD/M_TRIM_THRESHOLD makes the allocator reuse warm pages;
    the cost is RSS staying at peak working-set size."""
    try:
        import ctypes
        import sys

        if not sys.platform.startswith("linux"):
            return
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(M_TRIM_THRESHOLD, 1 << 30)
    except Exception:  # non-glibc / sandboxed — behavior is only a perf hint
        pass


_tune_allocator()

_log = logging.getLogger(__name__)
if not logging.root.handlers and not _log.handlers:
    _handler = logging.StreamHandler()
    _log.addHandler(_handler)
    _log.setLevel(logging.INFO)

from . import math  # noqa: E402
from .blocking import DictToArrayBijection, RaveledInfo  # noqa: E402
from .config import config, floatX  # noqa: E402
from .distributions import *  # noqa: E402,F401,F403
from .distributions import __all__ as _dist_all  # noqa: E402
from .exceptions import *  # noqa: E402,F401,F403
from .graph import Node, evaluate  # noqa: E402
from .model.transform import (  # noqa: E402
    clone_model,
    do,
    observe,
    change_value_transforms,
    freeze_dims_and_data,
)
from .model import (  # noqa: E402
    ConstantData,
    Data,
    MutableData,
    Deterministic,
    Model,
    Potential,
    compile,
    compile_fn,
    modelcontext,
    set_data,
)
from .functions import draw, logp, logcdf, logccdf, icdf  # noqa: E402
from .initial_point import make_initial_point  # noqa: E402
from .sampling import (  # noqa: E402
    sample,
    init_nuts,
    sample_prior_predictive,
    sample_posterior_predictive,
    compute_deterministics,
)
from .stats.log_density import compute_log_likelihood, compute_log_prior  # noqa: E402
from . import stats  # noqa: E402
from .stats import compare, ess, loo, rhat, waic  # noqa: E402
from .backends import InferenceData  # noqa: E402
from .backends.arviz import (  # noqa: E402
    predictions_to_inference_data,
    to_inference_data,
)
from .sampling.forward import compile_forward_sampling_function  # noqa: E402
from . import variational  # noqa: E402
from .variational import ADVI, ASVGD, SVGD, FullRankADVI, KLqp, fit  # noqa: E402
from .variational import (  # noqa: E402
    KL, KSD, Approximation, Group, ImplicitGradient, ObjectiveFunction,
    Operator, Stein, TestFunction, adadelta, adagrad, adagrad_window, adam,
    adamax, apply_momentum, apply_nesterov_momentum, momentum,
    nesterov_momentum, norm_constraint, rmsprop, sample_approx, sgd,
    total_norm_constraint,
)
from .variational.approximations import Empirical, FullRank, MeanField  # noqa: E402
from .data import Minibatch  # noqa: E402
from .smc import sample_smc  # noqa: E402
from . import gp  # noqa: E402
from .tuning.starting import find_MAP, find_hessian  # noqa: E402
from .model_graph import model_to_graphviz, model_to_mermaid, model_to_networkx  # noqa: E402
from .printing import str_for_dist, str_for_model  # noqa: E402
from .stats.summary import hdi, summary  # noqa: E402
from .func_utils import find_constrained_prior  # noqa: E402
from . import ode  # noqa: E402
from . import dims  # noqa: E402
from . import plots  # noqa: E402
from . import parallel  # noqa: E402
from .step_methods import (  # noqa: E402
    NUTS,
    HamiltonianMC,
    Metropolis,
    BinaryMetropolis,
    BinaryGibbsMetropolis,
    CategoricalGibbsMetropolis,
    DEMetropolis,
    DEMetropolisZ,
    Slice,
    CompoundStep,
)

__all__ = [
    "__version__",
    "math",
    "config",
    "floatX",
    "Node",
    "evaluate",
    "Model",
    "modelcontext",
    "Data",
    "ConstantData",
    "MutableData",
    "Deterministic",
    "Potential",
    "set_data",
    "compile",
    "compile_fn",
    "clone_model",
    "do",
    "observe",
    "change_value_transforms",
    "freeze_dims_and_data",
    "draw",
    "logp",
    "logcdf",
    "logccdf",
    "icdf",
    "make_initial_point",
    "sample",
    "init_nuts",
    "sample_prior_predictive",
    "sample_posterior_predictive",
    "compute_deterministics",
    "compute_log_likelihood",
    "compute_log_prior",
    "stats",
    "ess",
    "rhat",
    "InferenceData",
    "predictions_to_inference_data",
    "to_inference_data",
    "compile_forward_sampling_function",
    "variational",
    "Group", "Approximation", "sample_approx",
    "KL", "KSD", "Operator", "ObjectiveFunction", "TestFunction", "Stein",
    "ImplicitGradient",
    "sgd", "momentum", "nesterov_momentum", "adagrad", "adagrad_window",
    "rmsprop", "adadelta", "adam", "adamax", "apply_momentum",
    "apply_nesterov_momentum", "norm_constraint", "total_norm_constraint",
    "fit",
    "ADVI",
    "FullRankADVI",
    "SVGD",
    "ASVGD",
    "KLqp",
    "MeanField",
    "FullRank",
    "Empirical",
    "Minibatch",
    "sample_smc",
    "gp",
    "find_MAP",
    "find_hessian",
    "model_to_graphviz",
    "model_to_mermaid",
    "model_to_networkx",
    "str_for_dist",
    "str_for_model",
    "summary",
    "loo",
    "waic",
    "compare",
    "hdi",
    "find_constrained_prior",
    "ode",
    "dims",
    "plots",
    "parallel",
    "NUTS",
    "HamiltonianMC",
    "Metropolis",
    "BinaryMetropolis",
    "BinaryGibbsMetropolis",
    "CategoricalGibbsMetropolis",
    "DEMetropolis",
    "DEMetropolisZ",
    "Slice",
    "CompoundStep",
    "DictToArrayBijection",
    "RaveledInfo",
    *_dist_all,
]
