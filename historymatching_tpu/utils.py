"""Ensemble linear-algebra utilities.

TPU-first re-design of the reference's `tools/utils.py` (C7 in SURVEY.md):
pure jnp functions, explicit `jax.random` keys instead of global NumPy RNG,
and no multiprocessing — the ensemble axis is a leading array axis handled by
`vmap`/`shard_map` (see `historymatching_tpu.parallel`).

Semantics cross-checked against reference `tools/utils.py:10-148`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def center(E, axis=0, rescale=False):
    """Subtract the ensemble mean; return (anomalies, mean).

    If `rescale`, multiply anomalies by sqrt(N/(N-1)) to compensate the
    variance lost by centering (reference tools/utils.py:10-28).
    """
    E = jnp.asarray(E)
    x = jnp.mean(E, axis=axis, keepdims=True)
    X = E - x
    if rescale:
        N = E.shape[axis]
        X = X * jnp.sqrt(N / (N - 1))
    return X, jnp.squeeze(x, axis=axis)


def cov(a, b):
    """Cross-covariance of two samples with equal leading (ensemble) axis."""
    A, _ = center(a)
    B, _ = center(b)
    return A.T @ B / (B.shape[0] - 1)


def corr(a, b):
    """Correlation via `cov`, with inf clipped to +/-999 for plotting
    (reference tools/utils.py:42-55)."""
    C = cov(a, b)
    sa = jnp.std(jnp.asarray(a).T, axis=-1, ddof=1)
    sb = jnp.std(jnp.asarray(b), axis=0, ddof=1, keepdims=True)
    Corr = C / sa / sb
    return jnp.clip(Corr, -999, 999)


def gaussian_noise(key, N, M, L=1.0):
    """Sample a 0-mean Gaussian ensemble of shape (N, M).

    `L` is a Cholesky factor (M, M) or a scalar std-dev — same duck-typing
    contract as the reference (tools/utils.py:58-67), but keyed. The sample
    inherits a matrix factor's dtype (float32 pipelines stay float32)."""
    L = jnp.asarray(L)
    dtype = L.dtype if L.ndim == 2 else jnp.result_type(float)
    Z = jax.random.normal(key, (N, M), dtype=dtype)
    if L.ndim == 2:
        return Z @ L.T
    return Z * L


def rinv(A, reg, tikh=True, nMax=None):
    """Regularized/truncated SVD pseudo-inverse.

    Reproduces `sla.pinv(..., rtol=reg)` when `tikh=False`; Tikhonov spectrum
    `s/(s^2 + (reg*s_max)^2)` when `tikh=True` (reference tools/utils.py:70-90).

    The SVD is the custom-call-free one-sided Jacobi from `ops.linalg` — runs
    under jit on TPU backends without LAPACK (`jnp.linalg.svd` raises there).
    """
    from historymatching_tpu.ops.linalg import svd as _svd

    A = jnp.asarray(A)
    U, s, VT = _svd(A)
    reg = reg * s[0]
    if tikh:
        s1 = s / (s**2 + reg**2)
    else:
        s1 = jnp.where(s >= reg, 1.0 / jnp.where(s == 0, 1.0, s), 0.0)
    if nMax:
        keep = jnp.arange(s.shape[0]) < nMax
        s1 = jnp.where(keep, s1, 0.0)
    return (VT.T * s1) @ U.T


def svals(E, center_first=True):
    """Singular spectrum of an (anomaly) ensemble — the prior-spectrum
    diagnostic (reference HistoryMatch.py:332-333 uses `sla.svd(..., compute_uv
    =False)`). Device-safe (Jacobi SVD, no LAPACK custom call)."""
    from historymatching_tpu.ops.linalg import svd as _svd

    E = jnp.asarray(E)
    if center_first:
        E, _ = center(E)
    _, s, _ = _svd(E)
    return s


def mnorm(x, axis=0):
    """Mean-based L2 norm (dimension-agnostic; reference tools/utils.py:124-127)."""
    x = jnp.asarray(x)
    return jnp.sqrt(jnp.mean(x * x, axis))


def rms(x):
    """RMS of the ensemble mean field over the last axis, per leading index
    (reference HistoryMatch.py:972-974)."""
    x = jnp.asarray(x)
    xm2 = jnp.mean(x, 1) ** 2
    return jnp.sqrt(jnp.mean(xm2, -1))


def emph(text):
    """Bold terminal text (reference tools/utils.py:93-94)."""
    return f"\033[1m{text}\033[0m"


def split(arr, step):
    """Split `arr` into segments of length `step` (reference tools/enopt.py:64-72).
    Retained for API parity; the batched line search makes it unnecessary."""
    if not step:
        step = max(1, len(arr))
    return [arr[i : i + step] for i in range(0, len(arr), step)]


def print_RMSMs(series: dict, ref: str):
    """Print RMS error (vs `series[ref]`) and RMS deviation-from-mean tables
    (reference tools/utils.py:97-121). Host-side diagnostic."""
    x = np.asarray(series[ref])
    if x.shape[0] != 1:
        x = x[None, :]
    header = "Series    rms err  rms dev"
    print(header, "-" * len(header), sep="\n")
    rows = {}
    for k, y in series.items():
        y = np.asarray(y)
        if y.ndim < x.ndim:
            y = y[None, :]
        err = float(np.sqrt(np.mean((x - y.mean(0)) ** 2)))
        dev = float(np.sqrt(np.mean((y - y.mean(0)) ** 2)))
        rows[k] = (err, dev)
        print(f"{k:8}: {err:6.4f}   {dev:6.4f}")
    return rows


def pCircle(degree, Lx, Ly, p=4, norm_val=0.87):
    """(x, y) at angle `degree` on the p-norm circle, centred/scaled to the
    domain — well-placement helper (reference tools/utils.py:130-143)."""
    radians = 2 * np.pi * degree / 360
    c, s = np.cos(radians), np.sin(radians)
    norm = (np.abs(c) ** p + np.abs(s) ** p) ** (1 / p)
    x = Lx / 2 * (1 + norm_val / norm * c)
    y = Ly / 2 * (1 + norm_val / norm * s)
    return np.round(x, 2), np.round(y, 2)


def mesh2list(*arrs):
    """Meshgrid output -> (nPts, nDim) list of points (reference tools/utils.py:146-148)."""
    return jnp.stack([jnp.asarray(a) for a in arrs], -1).reshape(-1, len(arrs))


def vect(x, nTime=None, undo=False):
    """Flatten/unflatten the last two axes (time x space) of 2D/3D arrays.

    The reference closure (HistoryMatch.py:413-421) captures the notebook
    global `nTime`; here it is an explicit argument (required for `undo`).
    """
    x = jnp.asarray(x)
    if undo:
        if nTime is None:
            raise ValueError("vect(undo=True) requires nTime")
        *N, ab = x.shape
        return x.reshape(tuple(N) + (nTime, ab // nTime))
    *N, a, b = x.shape
    return x.reshape(tuple(N) + (a * b,))


def toeplitz(c):
    """Symmetric Toeplitz matrix from first column `c` (jnp, jit-safe)."""
    c = jnp.asarray(c)
    n = c.shape[0]
    idx = jnp.abs(jnp.arange(n)[:, None] - jnp.arange(n)[None, :])
    return c[idx]


def temporal_R(nTime, nPrd, variance=1e-2, length_tmp=2.0, cutoff=1e-2):
    """Temporally-correlated obs-error covariance R = kron(R1well, I_nPrd).

    Mirrors the reference construction (HistoryMatch.py:243-247): exponential
    correlation exp(-t/length_tmp) cut off below `cutoff`, scaled by `variance`.
    Returns (R, R12) with R12 the lower Cholesky factor.
    """
    corrs = np.exp(-np.arange(nTime) / length_tmp)
    corrs[corrs < cutoff] = 0.0
    R1 = variance * np.asarray(toeplitz(jnp.asarray(corrs)))
    R = np.kron(R1, np.eye(nPrd))
    R12 = np.linalg.cholesky(R)
    return jnp.asarray(R), jnp.asarray(R12)
