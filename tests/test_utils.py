import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg as sla

from historymatching_tpu import utils


def test_center(rng):
    E = rng.normal(size=(10, 4))
    X, x = utils.center(E)
    assert np.allclose(np.asarray(X) + np.asarray(x), E)
    assert np.allclose(np.mean(np.asarray(X), 0), 0, atol=1e-12)
    Xr, _ = utils.center(E, rescale=True)
    assert np.allclose(np.asarray(Xr), np.asarray(X) * np.sqrt(10 / 9))


def test_cov_corr(rng):
    a = rng.normal(size=(50, 3))
    b = rng.normal(size=(50, 5))
    C = np.asarray(utils.cov(a, b))
    A = a - a.mean(0)
    B = b - b.mean(0)
    assert np.allclose(C, A.T @ B / 49)
    Corr = np.asarray(utils.corr(a, a))
    assert np.allclose(np.diag(Corr), 1.0)
    assert np.all(np.abs(Corr) <= 1 + 1e-12)


def test_gaussian_noise_chol(key):
    L = np.linalg.cholesky(np.array([[2.0, 0.5], [0.5, 1.0]]))
    X = np.asarray(utils.gaussian_noise(key, 200_000, 2, jnp.asarray(L)))
    S = X.T @ X / len(X)
    assert np.allclose(S, L @ L.T, atol=0.05)
    Xs = np.asarray(utils.gaussian_noise(key, 100_000, 3, 0.5))
    assert abs(Xs.std() - 0.5) < 0.01


def test_rinv_matches_scipy_pinv(rng):
    A = rng.normal(size=(6, 10))
    # truncated form reproduces sla.pinv(..., rtol)
    ours = np.asarray(utils.rinv(A, reg=0.3, tikh=False))
    ref = sla.pinv(A, rtol=0.3)
    assert np.allclose(ours, ref, atol=1e-10)
    # Tikhonov form: check against direct SVD formula
    U, s, VT = np.linalg.svd(A, full_matrices=False)
    reg = 0.1 * s[0]
    expect = (VT.T * (s / (s**2 + reg**2))) @ U.T
    assert np.allclose(np.asarray(utils.rinv(A, reg=0.1, tikh=True)), expect, atol=1e-12)


def test_vect_roundtrip(rng):
    x = rng.normal(size=(7, 40, 4))
    v = utils.vect(x)
    assert v.shape == (7, 160)
    back = utils.vect(v, nTime=40, undo=True)
    assert np.allclose(np.asarray(back), x)
    x2 = rng.normal(size=(40, 4))
    assert utils.vect(x2).shape == (160,)


def test_temporal_R():
    R, R12 = utils.temporal_R(nTime=40, nPrd=4)
    R = np.asarray(R)
    R12 = np.asarray(R12)
    assert R.shape == (160, 160)
    assert np.allclose(R12 @ R12.T, R, atol=1e-12)
    # kron structure: adjacent wells at same time are uncorrelated
    assert R[0, 1] == 0
    # same well, adjacent times: 1e-2 * exp(-1/2)
    assert np.isclose(R[0, 4], 1e-2 * np.exp(-0.5))
    assert np.isclose(R[0, 0], 1e-2)


def test_mesh2list():
    g = np.linspace(0, 1, 3)
    pts = np.asarray(utils.mesh2list(*np.meshgrid(g, g)))
    assert pts.shape == (9, 2)


def test_rms(rng):
    x = rng.normal(size=(5, 12, 7))
    r = np.asarray(utils.rms(x))
    expect = np.sqrt(np.mean(np.mean(x, 1) ** 2, -1))
    assert np.allclose(r, expect)
