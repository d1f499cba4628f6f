"""Exact-arithmetic f64 oracle forward model (CPU only).

Purpose: the float64 *reference* side of the posterior-quality parity
harness (scripts/parity.py). The production pipeline solves the TPFA
pressure system with matrix-free MG-PCG (models/ressim.py:pressure_step);
an iterative reference is only as good as its tolerance/budget, which
round-2 review flagged as a standing fairness question (the f64 oracle
must never be effort-starved relative to the f32 run under test). This
module removes the question entirely: the pressure system is solved
EXACTLY (to f64 roundoff) by a banded Cholesky factorization (LAPACK
dpbsv via scipy.linalg.solveh_banded) of the very same pinned SPD
operator, assembled from the same `transmissibilities` /
`stencil_diag` arrays the matrix-free path uses. Everything else
(mobilities, sources, fluxes, CFL-substepped upwind transport,
observation extraction) reuses the production code verbatim, vmapped
over members, in float64.

This mirrors the reference simulator's own design (scipy sparse direct
solve, SURVEY.md S1.8) — the oracle is "what the reference would
compute" with this repo's discretization, with zero solver-tuning
degrees of freedom.

Structure per time step: a jitted+vmapped JAX "pre" pass builds the
banded operator and RHS per member; the host loops LAPACK solves over
members; a jitted+vmapped "post" pass turns the exact pressures into
fluxes and advances transport. Host↔device traffic is a few MB/step —
irrelevant on CPU, and this module never runs on TPU.

Validation (tests/test_oracle.py): banded assembly == stencil_matvec on
random vectors; oracle forward == f64 MG-PCG forward at tight tolerance;
end-to-end posterior cross-check lives in parity/ artifacts.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from historymatching_tpu.models.ressim import (
    ResSim,
    _rates_seq,
    _source_field,
    relperm,
    transport_step,
)
from historymatching_tpu.ops.stencil import (
    face_fluxes,
    stencil_diag,
    transmissibilities,
)


def banded_operator(TX, TY, diag):
    """LAPACK upper-banded storage of the pinned TPFA operator.

    Flat ordering is the row-major reshape of (Nx, Ny): j = ix*Ny + iy, so
    the y-neighbor coupling -TY sits at offset 1 and the x-neighbor
    coupling -TX at offset Ny. Returns ab with shape (Ny+1, Nx*Ny) in the
    `scipy.linalg.solveh_banded` convention ab[u + i - j, j] = A[i, j]
    (u = Ny); the interior rows 1..Ny-2 are structurally zero.
    """
    Nx, Ny = diag.shape
    ab = jnp.zeros((Ny + 1, Nx * Ny), dtype=diag.dtype)
    ab = ab.at[Ny, :].set(diag.reshape(-1))
    # A[j-1, j] = -TY[ix, iy-1] for iy >= 1 (none across the iy=0 seam)
    ty = jnp.pad(TY, ((0, 0), (1, 0)))
    ab = ab.at[Ny - 1, :].set(-ty.reshape(-1))
    # A[j-Ny, j] = -TX[ix-1, iy] for ix >= 1
    tx = jnp.pad(TX, ((1, 0), (0, 0)))
    ab = ab.at[0, :].set(-tx.reshape(-1))
    return ab


def banded_matvec(ab, x):
    """Dense check helper: y = A @ x from the banded storage (numpy)."""
    ab = np.asarray(ab)
    x = np.asarray(x).reshape(-1)
    u = ab.shape[0] - 1
    y = ab[u] * x
    for k in range(1, u + 1):
        band = ab[u - k, k:]  # A[j-k, j] for j >= k
        y[:-k] += band * x[k:]
        y[k:] += band * x[:-k]
    return y


def _pre_factory(model: ResSim):
    """Jitted per-member operator/RHS assembly: (perm-K, s, inj_t, prd_t)
    -> (ab, q, TX, TY). K enters as the already-transformed (2, Nx, Ny)
    permeability so the oracle composes with any `transf`."""
    g = model.grid

    def pre(K, s, inj_t, prd_t):
        Mw, Mo = relperm(s, model.fluid)
        mob = Mw + Mo
        TX, TY = transmissibilities(K[0] * mob, K[1] * mob, g.hx, g.hy)
        diag = stencil_diag(TX, TY)  # pinned at cell (0,0) with mean(diag)
        q = _source_field(model, inj_t, prd_t).astype(s.dtype)
        return banded_operator(TX, TY, diag), q, TX, TY

    return jax.jit(jax.vmap(pre, in_axes=(0, 0, None, None)))


def _post_factory(model: ResSim, dt, max_substeps):
    """Jitted per-member flux + transport advance: (TX, TY, p, s, q) ->
    (s_new, n_sub)."""

    def post(TX, TY, p, s, q):
        Fx, Fy = face_fluxes(TX, TY, p)
        return transport_step(model, s, Fx, Fy, q, dt,
                              max_substeps=max_substeps, use_pallas=False)

    return jax.jit(jax.vmap(post))


def simulate_oracle(model: ResSim, K_ens, wsat0, dt, nTime, max_substeps=4096):
    """Run nTime steps for a batch of members with EXACT pressure solves.

    K_ens: (N, 2, Nx, Ny) transformed permeabilities; wsat0: (Nxy,) shared
    or (N, Nxy) per-member initial saturations. Returns (wsats_last
    (N, 1, Nxy), sats (N, nTime, Nxy)) in float64.
    """
    from scipy.linalg import solveh_banded

    g = model.grid
    N = K_ens.shape[0]
    dtype = jnp.float64
    assert jax.config.jax_enable_x64, "the oracle is an f64 reference"
    K_ens = jnp.asarray(K_ens, dtype)
    wsat0 = jnp.asarray(wsat0, dtype)
    if wsat0.ndim == 1:
        wsat0 = jnp.broadcast_to(wsat0, (N, g.Nxy))
    s = wsat0.reshape(N, g.Nx, g.Ny)

    inj_seq = np.asarray(_rates_seq(model.inj_rates, nTime), dtype)
    prd_seq = np.asarray(_rates_seq(model.prd_rates, nTime), dtype)
    pre = _pre_factory(model)
    post = _post_factory(model, dt, max_substeps)

    sats = []
    for t in range(nTime):
        ab, q, TX, TY = pre(K_ens, s, jnp.asarray(inj_seq[t]),
                            jnp.asarray(prd_seq[t]))
        ab_np = np.asarray(ab)
        q_np = np.asarray(q).reshape(N, -1)
        p = np.empty_like(q_np)
        for i in range(N):
            p[i] = solveh_banded(ab_np[i], q_np[i], lower=False)
        s, _ = post(TX, TY, jnp.asarray(p).reshape(N, g.Nx, g.Ny), s, q)
        sats.append(np.asarray(s.reshape(N, -1)))

    sats = jnp.asarray(np.stack(sats, axis=1))  # (N, nTime, Nxy)
    return sats[:, -1:, :], sats


def forward_oracle(model: ResSim, perm_ens, wsat0=None, dt=0.025, nTime=40,
                   *, transf=None, keep_wsats=False, **_ignored):
    """Drop-in for `parallel.runner.forward_model(keep_wsats=False)` on the
    f64 CPU oracle path: (N, Nxy) pre-permeability fields -> (final_state
    (N, 1, Nxy), prods (N, nTime, nPrd)).

    Extra solver kwargs are accepted and ignored (the direct solve has no
    tuning knobs) so call sites can pass a common kwargs dict.
    """
    from historymatching_tpu.parallel.runner import perm_transf, prod_inds, set_perm

    if transf is None:
        transf = perm_transf
    del set_perm  # K built directly below (batched)
    perm_ens = jnp.atleast_2d(jnp.asarray(perm_ens, jnp.float64))
    N = perm_ens.shape[0]
    g = model.grid
    if wsat0 is None:
        wsat0 = jnp.zeros(g.Nxy, jnp.float64)
    P = transf(perm_ens).reshape(N, g.Nx, g.Ny)
    K_ens = jnp.stack([P, P], axis=1)  # (N, 2, Nx, Ny) — both directions
    last, sats = simulate_oracle(model, K_ens, wsat0, dt, nTime)
    prods = sats[:, :, np.asarray(prod_inds(model))]  # (N, nTime, nPrd)
    if keep_wsats:
        w0 = jnp.asarray(wsat0)
        w0 = w0[:, None, :] if w0.ndim == 2 else jnp.broadcast_to(
            w0, (N, g.Nxy))[:, None, :]
        return jnp.concatenate([w0, sats], axis=1), prods
    return last, prods
