"""Mass-matrix scaling helpers.

Parity: reference pymc/tuning/scaling.py (guess_scaling:113, trace_cov:139).
"""

import numpy as np

from .starting import guess_scaling

__all__ = ["guess_scaling", "trace_cov"]


def trace_cov(trace, vars=None, model=None):
    """Empirical covariance of flattened posterior draws
    (reference scaling.py:139). Accepts an InferenceData or MultiTrace."""
    post = trace.posterior if hasattr(trace, "posterior") else None
    if post is not None:
        names = vars if vars is not None else list(post.keys())
        cols = [
            np.asarray(post[getattr(n, "name", n)].values).reshape(
                -1, int(np.prod(post[getattr(n, "name", n)].values.shape[2:]) or 1)
            )
            for n in names
        ]
    else:  # MultiTrace
        names = vars if vars is not None else trace.varnames
        cols = [
            np.asarray(trace.get_values(getattr(n, "name", n))).reshape(
                len(trace) * trace.nchains, -1
            )
            for n in names
        ]
    x = np.concatenate(cols, axis=1)
    return np.atleast_2d(np.cov(x, rowvar=False))
