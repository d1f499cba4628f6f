"""Geostatistical Gaussian random-field priors.

Re-design of the reference's `tools/geostat.py` (C6 in SURVEY.md). Two
samplers for the same law (Gaussian variogram / squared-exponential
covariance):

- `gaussian_fields_dense`: dense distance matrix + pure-GEMM symmetric
  square-root factor — exact, O(n^3); replaces the reference's Cholesky path
  (tools/geostat.py:86-99) for small grids / irregular point sets.
- `gaussian_fields_fft`: circulant-embedding spectral sampler — O(n log n),
  the TPU-native path for 64x64+ grids (the reference notes its dense paths
  fail beyond ~50^2, tools/geostat.py:95-97). FFTs and the elementwise
  spectrum scale run on-device.

`gaussian_fields(pts, ...)` picks Cholesky below a size threshold and FFT
above when `pts` is a regular mesh.
"""

from __future__ import annotations

from functools import partial

from historymatching_tpu.ops.linalg import _full_precision

import jax
import jax.numpy as jnp
import numpy as np


def variogram_gauss(xx, r, n=0.0, a=1.0 / 3.0):
    """Gaussian variogram with range `r`, nugget `n`, shape `a`.

    gamma(x) = (1-n) * (1 - exp(-x^2 / (r^2 a))), plus nugget `n` for x != 0.
    Values cross-checked against the reference doctest
    (tools/geostat.py:19-23): variogram_gauss([0,1,2], 1, n=0.1, a=1)
    == [0, 0.6689085, 0.98351593].
    """
    xx = jnp.asarray(xx, dtype=jnp.result_type(float))
    gamma = 1 - jnp.exp(-(xx**2) / r**2 / a)
    gamma = gamma * (1 - n)
    return jnp.where(xx != 0, gamma + n, gamma)


def cov_gauss(dists, r, n=0.0, a=1.0 / 3.0):
    """Stationary covariance C(d) = 1 - variogram(d)."""
    return 1.0 - variogram_gauss(dists, r, n=n, a=a)


def vectorize(*XYZ):
    """Mesh arrays -> (nPt, nDim) point list (reference tools/geostat.py:33-40)."""
    return jnp.stack([jnp.asarray(a) for a in XYZ]).reshape((len(XYZ), -1)).T


def dist_euclid(X):
    """Full pairwise distance matrix of one point set."""
    X = jnp.asarray(X, dtype=jnp.result_type(float))
    diff = X[:, None, :] - X[None, :, :]
    return jnp.sqrt(jnp.sum(diff**2, axis=-1))


def funm_psd(C, fun, rk=None, rtol=1e-8, sym_square=True):
    """Matrix function of a PSD matrix via (truncated) eigendecomposition
    (reference tools/geostat.py:50-83). Device-safe: the eigendecomposition
    is the custom-call-free Jacobi routine from `ops.linalg` (eigenvalues
    descending), so this runs under jit on LAPACK-less TPU backends."""
    from historymatching_tpu.ops.linalg import eigh_psd

    C = jnp.asarray(C)
    ews, V = eigh_psd(C)  # descending
    if rk:
        keep = jnp.arange(ews.shape[0]) < rk
        ews = jnp.where(keep, ews, 0.0)
    ews = jnp.where(ews > rtol * jnp.max(ews), ews, 0.0)
    few = jnp.where(ews > 0, fun(jnp.where(ews > 0, ews, 1.0)), 0.0)
    funC = V * few
    if sym_square:
        funC = funC @ V.T
    return funC


@partial(jax.jit, static_argnames=("N",))
def gaussian_fields_dense(key, pts, N=1, r=0.2):
    """Exact dense sampler: fields = randn(N, n) @ F with F F' = Cov.

    `pts` is a tuple of mesh/coordinate arrays (as `model.mesh`). The factor
    is the *symmetric* PSD square root via Newton-Schulz (`ops.linalg.
    sqrtm_psd`) rather than the reference's Cholesky (tools/geostat.py:97):
    any factor with F F' = Cov yields the same Gaussian law, and the pure-GEMM
    square root (a) runs on TPU backends without the Cholesky custom call and
    (b) never breaks down on the near-singular Gaussian covariance (the
    reference needs a 1e-10 jitter for exactly that reason).
    """
    from historymatching_tpu.ops.linalg import sqrtm_psd

    pts_ = vectorize(*pts)
    dists = dist_euclid(pts_)
    Cov = cov_gauss(dists, r)
    F = sqrtm_psd(Cov)
    Z = jax.random.normal(key, (N, Cov.shape[0]), dtype=Cov.dtype)
    return Z @ F  # symmetric factor: F == F.T


# Backwards-compatible name (the reference path it replaces used Cholesky).
gaussian_fields_chol = gaussian_fields_dense


def _embedding_spectrum(Nx, Ny, hx, hy, r):
    """Real FFT spectrum of the covariance on a doubled periodic grid.

    Negative eigenvalues of the embedding (possible for very smooth kernels)
    are clipped to zero — the standard circulant-embedding fallback; the
    resulting bias is checked in tests against the exact Cholesky sampler.
    """
    Mx, My = 2 * Nx, 2 * Ny
    ix = np.minimum(np.arange(Mx), Mx - np.arange(Mx)) * hx
    iy = np.minimum(np.arange(My), My - np.arange(My)) * hy
    d = np.sqrt(ix[:, None] ** 2 + iy[None, :] ** 2)
    # Pure NumPy on purpose: this runs at trace time (static grid/r), and
    # jnp ops inside a jit trace would be staged, breaking np.fft below.
    a = 1.0 / 3.0
    C = np.exp(-(d**2) / r**2 / a)
    S = np.fft.fft2(C).real
    S = np.maximum(S, 0.0)
    return jnp.asarray(S), (Mx, My)


def _dft_mats(M, dtype):
    """Real/imag parts of the M x M DFT matrix (host-precomputed constants)."""
    jk = np.outer(np.arange(M), np.arange(M)) * (2.0 * np.pi / M)
    return jnp.asarray(np.cos(jk), dtype=dtype), jnp.asarray(-np.sin(jk), dtype=dtype)


@partial(jax.jit, static_argnames=("grid", "N", "r", "dtype"))
@_full_precision
def gaussian_fields_fft(key, grid, N=1, r=0.2, dtype=None):
    """Spectral (circulant embedding) sampler on a regular `Grid2D`.

    field = Re(DFT2(sqrt(S/M) * zeta)) with zeta complex white noise
    (Re, Im parts iid N(0,1)) has exactly covariance C on the embedded torus.

    The 2D DFT is evaluated as matmuls with host-precomputed DFT matrices in
    *real* arithmetic (8 GEMMs): the TPU backend here implements neither FFT
    nor complex custom calls, and for these sizes (M <= a few hundred) the
    MXU matmul form is as fast as an FFT anyway.
    Returns (N, Nxy) fields flattened in the grid's C-order over (Nx, Ny).
    """
    S, (Mx, My) = _embedding_spectrum(grid.Nx, grid.Ny, grid.hx, grid.hy, r)
    # Explicit dtype pins the PRNG bit consumption: the same key yields the
    # same field regardless of the enabled-x64 mode (required for the f32/f64
    # paired-seed parity harness).
    if dtype is None:
        dtype = jnp.result_type(float)
    amp = jnp.sqrt(S / (Mx * My)).astype(dtype)
    k1, k2 = jax.random.split(key)
    Cr = amp[None] * jax.random.normal(k1, (N, Mx, My), dtype=dtype)
    Ci = amp[None] * jax.random.normal(k2, (N, Mx, My), dtype=dtype)
    Ar, Ai = _dft_mats(Mx, dtype)
    Br, Bi = _dft_mats(My, dtype)
    # T = Fx @ C  (complex), expanded in real parts
    Tr = jnp.einsum("ab,nbc->nac", Ar, Cr) - jnp.einsum("ab,nbc->nac", Ai, Ci)
    Ti = jnp.einsum("ab,nbc->nac", Ar, Ci) + jnp.einsum("ab,nbc->nac", Ai, Cr)
    # field = Re(T @ Fy^T)
    fields = jnp.einsum("nac,dc->nad", Tr, Br) - jnp.einsum("nac,dc->nad", Ti, Bi)
    return fields[:, : grid.Nx, : grid.Ny].reshape(N, grid.Nxy)


def gaussian_fields(pts, N=1, r=0.2, key=None, grid=None):
    """Sample N stationary Gaussian random fields with unit variance.

    Drop-in analogue of the reference `gaussian_fields(pts, N, r)`
    (tools/geostat.py:86-99) with an explicit PRNG `key`. If `grid` is given
    the FFT (circulant-embedding) sampler is used — exact on the embedded
    torus, O(n log n), and factorization-free. The dense path serves
    irregular point sets.
    """
    if key is None:
        raise ValueError("gaussian_fields requires an explicit jax.random key")
    if grid is not None:
        return gaussian_fields_fft(key, grid, N=N, r=r)
    return gaussian_fields_dense(key, pts, N=N, r=r)


def sample_prior_perm(key, model, N, r=0.8):
    """Prior pre-permeability fields for a model/grid
    (reference HistoryMatch.py:151-153: gaussian_fields(model.mesh, N, r=0.8))."""
    grid = getattr(model, "grid", model)
    return gaussian_fields(grid.mesh, N=N, r=r, key=key, grid=grid)
