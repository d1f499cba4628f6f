import jax
import numpy as np

from historymatching_tpu.da import geostat
from historymatching_tpu.grid import Grid2D


def test_variogram_gauss_reference_values():
    # Reference doctest (tools/geostat.py:19-23)
    xx = np.array([0.0, 1.0, 2.0])
    got = np.asarray(geostat.variogram_gauss(xx, 1, n=0.1, a=1))
    assert np.allclose(got, [0.0, 0.6689085, 0.98351593], atol=1e-7)


def test_chol_fields_stats(key):
    g = Grid2D(Nx=12, Ny=12, Lx=1, Ly=1)
    N = 4000
    F = np.asarray(geostat.gaussian_fields_chol(key, g.mesh, N=N, r=0.5))
    assert F.shape == (N, 144)
    assert abs(F.mean()) < 0.03
    assert abs(F.var() - 1.0) < 0.05
    # spatial correlation decays with distance: corr between neighbours high
    c_near = np.corrcoef(F[:, 0], F[:, 1])[0, 1]
    c_far = np.corrcoef(F[:, 0], F[:, -1])[0, 1]
    assert c_near > 0.9
    assert abs(c_far) < 0.15


def test_fft_matches_chol_covariance(key):
    """The FFT circulant-embedding sampler must produce (statistically) the
    same law as the exact Cholesky sampler."""
    g = Grid2D(Nx=16, Ny=16, Lx=2, Ly=1)
    N = 6000
    r = 0.8
    k1, k2 = jax.random.split(key)
    Fc = np.asarray(geostat.gaussian_fields_chol(k1, g.mesh, N=N, r=r))
    Ff = np.asarray(geostat.gaussian_fields_fft(k2, g, N=N, r=r))
    assert Ff.shape == Fc.shape
    # marginal variance
    assert abs(Ff.var() - 1.0) < 0.08
    # covariance vs a probe cell, compared between samplers
    i0 = g.Nxy // 2
    cov_c = Fc.T @ Fc[:, i0] / N
    cov_f = Ff.T @ Ff[:, i0] / N
    assert np.sqrt(np.mean((cov_c - cov_f) ** 2)) < 0.08


def test_sample_prior_perm_dispatch(key):
    g_small = Grid2D(Nx=10, Ny=10)
    F = geostat.sample_prior_perm(key, g_small, N=3, r=0.8)
    assert F.shape == (3, 100)
    g_big = Grid2D(Nx=64, Ny=64)
    F = geostat.sample_prior_perm(key, g_big, N=3, r=0.8)
    assert F.shape == (3, 64 * 64)
