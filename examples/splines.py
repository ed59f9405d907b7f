"""B-spline regression (the cherry-blossom-style semiparametric workflow).

A smooth function is modeled as a B-spline basis expansion with a
random-walk prior on the coefficients (penalized-spline shrinkage, the
reference's spline case study pattern). The basis is plain numpy — the
model only sees a fixed design matrix, so the TPU logp is one dense
matmul riding the MXU.
"""

import numpy as np

import pymc_tpu as pm


def bspline_basis(x, knots, degree=3):
    """Cox-de-Boor recursion; returns (len(x), len(knots)+degree-1)."""
    knots = np.concatenate(
        [[knots[0]] * degree, knots, [knots[-1]] * degree]
    )
    n_basis = len(knots) - degree - 1
    basis = np.zeros((len(x), n_basis))
    for i in range(n_basis):
        basis[:, i] = _bspline(x, knots, i, degree)
    # partition of unity at the right boundary
    basis[x >= knots[-1], -1] = 1.0
    return basis


def _bspline(x, t, i, k):
    if k == 0:
        return ((t[i] <= x) & (x < t[i + 1])).astype(float)
    out = np.zeros_like(x, dtype=float)
    d1 = t[i + k] - t[i]
    if d1 > 0:
        out += (x - t[i]) / d1 * _bspline(x, t, i, k - 1)
    d2 = t[i + k + 1] - t[i + 1]
    if d2 > 0:
        out += (t[i + k + 1] - x) / d2 * _bspline(x, t, i + 1, k - 1)
    return out


rng = np.random.default_rng(11)
n = 300
x = np.sort(rng.uniform(0, 10, n))
f_true = np.sin(x) + 0.3 * x
y = f_true + rng.normal(0, 0.4, n)

knots = np.linspace(0, 10, 12)
B = bspline_basis(x, knots)  # (n, 14)
print("basis:", B.shape)

with pm.Model(coords={"basis": np.arange(B.shape[1])}) as model:
    tau = pm.HalfNormal("tau", 2.0)
    # random-walk prior on adjacent coefficients = penalized spline
    w = pm.GaussianRandomWalk(
        "w", sigma=tau, init_dist=pm.Normal.dist(0, 5), shape=B.shape[1],
        dims="basis",
    )
    sigma = pm.HalfNormal("sigma", 1.0)
    mu = pm.Deterministic("mu", pm.math.dot(B, w))
    pm.Normal("y", mu=mu, sigma=sigma, observed=y)

idata = pm.sample(draws=800, tune=800, chains=4, model=model, random_seed=2,
                  progressbar=False)

print(pm.summary(idata, var_names=["tau", "sigma"]))
mu_hat = idata.posterior["mu"].values.mean(axis=(0, 1))
rmse = float(np.sqrt(np.mean((mu_hat - f_true) ** 2)))
sigma_hat = float(idata.posterior["sigma"].values.mean())
print("fit RMSE vs truth:", round(rmse, 3), "(noise sd 0.4)")
print("sigma:", round(sigma_hat, 3), "(true 0.4)")
assert rmse < 0.2  # the spline mean recovers the smooth function
assert abs(sigma_hat - 0.4) < 0.08
