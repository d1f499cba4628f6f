"""Validation of the exact-solve f64 oracle (models/oracle.py) against the
production matrix-free pipeline.

The oracle is the reference side of the posterior-quality parity harness —
these tests pin that (a) the banded operator it factorizes IS the stencil
operator the iterative path applies, and (b) its end-to-end forward agrees
with the f64 MG-PCG forward to solver tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np

from historymatching_tpu.da.geostat import gaussian_fields_fft
from historymatching_tpu.models.oracle import (
    banded_matvec,
    banded_operator,
    forward_oracle,
)
from historymatching_tpu.models.ressim import relperm
from historymatching_tpu.ops.stencil import (
    stencil_diag,
    stencil_matvec,
    transmissibilities,
)
from historymatching_tpu.parallel.runner import forward_model, perm_transf
from tests.test_sim import default_model


def test_banded_assembly_matches_stencil_matvec(rng):
    """A_banded @ x == stencil_matvec(TX, TY, diag, x) for random fields:
    the direct solver factorizes exactly the operator the CG path applies."""
    m = default_model(Nx=12, Ny=9)
    s = jnp.asarray(rng.uniform(0.0, 1.0, m.shape))
    K = jnp.asarray(np.exp(rng.normal(0, 1.5, (2,) + m.shape)))
    Mw, Mo = relperm(s, m.fluid)
    mob = Mw + Mo
    TX, TY = transmissibilities(K[0] * mob, K[1] * mob, m.grid.hx, m.grid.hy)
    diag = stencil_diag(TX, TY)
    ab = banded_operator(TX, TY, diag)
    for _ in range(3):
        x = rng.normal(size=m.shape)
        y_banded = banded_matvec(ab, x)
        y_stencil = np.asarray(stencil_matvec(TX, TY, diag, jnp.asarray(x)))
        np.testing.assert_allclose(y_banded, y_stencil.reshape(-1),
                                   rtol=1e-13, atol=1e-13)


def test_oracle_solves_pinned_system_exactly(rng):
    """solveh_banded on the assembled operator reproduces A p = q to f64
    roundoff, including the (0,0) pin gauge (p[0] == 0 for balanced q)."""
    from scipy.linalg import solveh_banded

    m = default_model(Nx=16, Ny=16)
    s = jnp.asarray(rng.uniform(0.0, 1.0, m.shape))
    K = jnp.asarray(np.exp(rng.normal(0, 2.0, (2,) + m.shape)))
    Mw, Mo = relperm(s, m.fluid)
    mob = Mw + Mo
    TX, TY = transmissibilities(K[0] * mob, K[1] * mob, m.grid.hx, m.grid.hy)
    diag = stencil_diag(TX, TY)
    ab = np.asarray(banded_operator(TX, TY, diag))
    q = rng.normal(size=m.Nxy)
    q -= q.mean()  # balanced sources (1'q = 0)
    p = solveh_banded(ab, q, lower=False)
    r = q - banded_matvec(ab, p)
    assert np.linalg.norm(r) <= 1e-10 * np.linalg.norm(q)
    assert abs(p[0]) <= 1e-12 * np.abs(p).max()


def test_forward_oracle_matches_f64_pcg():
    """End-to-end (multi-step, ensemble): exact-solve oracle vs the
    production forward at tight f64 PCG tolerance. Productions and final
    states must agree to solver tolerance — this is the lemma behind using
    the oracle as the parity harness's f64 reference."""
    m = default_model(Nx=16, Ny=16)
    key = jax.random.PRNGKey(5)
    prior = gaussian_fields_fft(key, m.grid, N=4, r=0.8).astype(jnp.float64)
    nTime = 12

    last_o, prods_o = forward_oracle(m, prior, dt=0.025, nTime=nTime)
    last_i, prods_i = forward_model(m, prior, dt=0.025, nTime=nTime,
                                    keep_wsats=False, tol=1e-11,
                                    maxiter=4096, patience_iters=4096)
    np.testing.assert_allclose(np.asarray(prods_o), np.asarray(prods_i),
                               rtol=0, atol=5e-8)
    np.testing.assert_allclose(np.asarray(last_o), np.asarray(last_i),
                               rtol=0, atol=5e-8)


def test_forward_oracle_keep_wsats_and_restart():
    """keep_wsats=True prepends the initial state; restarting from the
    returned final state continues the trajectory (same contract as
    forward_model)."""
    m = default_model(Nx=16, Ny=16)
    key = jax.random.PRNGKey(9)
    prior = gaussian_fields_fft(key, m.grid, N=3, r=0.8).astype(jnp.float64)

    wsats, prods = forward_oracle(m, prior, dt=0.025, nTime=8, keep_wsats=True)
    assert wsats.shape == (3, 9, m.Nxy)
    np.testing.assert_array_equal(np.asarray(wsats[:, 0]), 0.0)

    last_a, prods_a = forward_oracle(m, prior, dt=0.025, nTime=4)
    last_b, prods_b = forward_oracle(m, prior, wsat0=last_a[:, 0],
                                     dt=0.025, nTime=4)
    np.testing.assert_allclose(np.asarray(prods_b),
                               np.asarray(prods[:, 4:]), rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(last_b[:, 0]),
                               np.asarray(wsats[:, -1]), rtol=0, atol=1e-12)


def test_forward_oracle_perm_transf_applied():
    """The default pre-permeability transform matches the production
    runner's (0.1 + exp(5x), capped)."""
    m = default_model(Nx=16, Ny=16)
    x = jnp.zeros((1, m.Nxy), jnp.float64)
    _, prods_id = forward_oracle(m, x, dt=0.025, nTime=3,
                                 transf=lambda v: perm_transf(v))
    _, prods_def = forward_oracle(m, x, dt=0.025, nTime=3)
    np.testing.assert_array_equal(np.asarray(prods_id), np.asarray(prods_def))
