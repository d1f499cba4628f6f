"""Geometric multigrid V-cycle preconditioner for the TPFA pressure system.

Why: Jacobi-CG iteration counts grow with grid size and permeability
contrast (log-normal K with sigma=5 reaches 1e4-1e7 contrast), and in
float32 the attainable residual floor degrades with the effective condition
number — measured floors of 1e-2..1 on hard members, which poisoned the
transport step. A V-cycle preconditioner makes CG convergence (nearly)
grid-independent and pulls the f32 floor down by orders of magnitude.

Design (cell-centered, SPD by construction so CG theory applies):
- **Galerkin coarsening with constant 2x2 aggregates**: with restriction =
  block sum and prolongation = its adjoint (constant injection), the Galerkin
  operator R A P of a 5-point TPFA matrix is again a 5-point TPFA matrix
  whose face transmissibilities are the *sums of the fine transmissibilities
  across each aggregate interface*. Galerkin makes the coarse-grid correction
  an A-orthogonal projection, so the V-cycle cannot amplify error — plain
  coefficient averaging was measured to *diverge* at contrast ~1e7;
- damped-Jacobi smoothing (omega = 0.7), same pre- and post-sweeps, so the
  V-cycle is a fixed SPD operator (valid PCG preconditioner);
- the (0,0) diagonal pin is inherited exactly: R (pin e00 e00') P keeps the
  pin on the coarse (0,0) aggregate;
- coarsest level solved exactly: the operator (<= ~64 unknowns) is
  materialized by applying the stencil to the identity and inverted by the
  (diagonally scaled) Newton-Schulz iteration — no LAPACK custom calls, so
  it runs on any backend and batches under vmap.

Levels coarsen while both dims are even and > 4.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from historymatching_tpu.ops.linalg import spd_inverse
from historymatching_tpu.ops.stencil import stencil_diag, stencil_matvec


def n_levels(Nx, Ny, min_dim=4):
    """Number of multigrid levels available for a grid (static)."""
    n = 1
    while Nx % 2 == 0 and Ny % 2 == 0 and Nx > min_dim and Ny > min_dim:
        Nx //= 2
        Ny //= 2
        n += 1
    return n


def _coarsen_faces(TX, TY):
    """Galerkin (constant-aggregate) coarse face transmissibilities.

    TX (Nx-1, Ny): the coarse x-face between aggregates (I,J) and (I+1,J)
    collects the fine faces at i = 2I+1, j in {2J, 2J+1}; analogously TY.
    """
    Nxm1, Ny = TX.shape
    Nxc, Nyc = (Nxm1 + 1) // 2, Ny // 2
    TXc = TX[1::2, :].reshape(Nxc - 1, Nyc, 2).sum(-1)
    Nx, Nym1 = TY.shape
    TYc = TY[:, 1::2].reshape(Nx // 2, 2, Nyc - 1).sum(1)
    return TXc, TYc


def _coarsen_diag(TX, TY, diag):
    """Galerkin coarse diagonal for a *general* 5-point operator.

    diag_c[I] = sum of all fine entries in the aggregate block
              = restrict(diag) - 2 * (intra-aggregate face transmissibilities).
    For the TPFA case (diag = row sums + pin) this equals the coarse row sums
    + pin exactly; for symmetrically-scaled operators (unit diagonal) the
    explicit form is required — the coarse diagonal is no longer a row sum.
    """
    Nx, Ny = diag.shape
    Nxc, Nyc = Nx // 2, Ny // 2
    intra_x = TX[0::2, :].reshape(Nxc, Nyc, 2).sum(-1)
    intra_y = TY[:, 0::2].reshape(Nxc, 2, Nyc).sum(1)
    return _restrict(diag) - 2.0 * intra_x - 2.0 * intra_y


def build_hierarchy_5pt(TX, TY, diag, levels=None):
    """Per-level (TX, TY, diag) Galerkin data for a general SPD 5-point
    operator (explicit diagonal), fine to coarse."""
    if levels is None:
        levels = n_levels(TX.shape[0] + 1, TY.shape[1] + 1)
    out = [(TX, TY, diag)]
    for _ in range(levels - 1):
        diag = _coarsen_diag(TX, TY, diag)
        TX, TY = _coarsen_faces(TX, TY)
        out.append((TX, TY, diag))
    return out


def build_hierarchy(TX, TY, pin, levels=None):
    """Per-level (TX, TY, diag) Galerkin operator data, fine to coarse.

    `pin` is the fine-level nullspace anchor added at cell (0,0); Galerkin
    coarsening transports it unchanged to every coarse (0,0)."""
    return build_hierarchy_5pt(TX, TY, stencil_diag(TX, TY, pin=pin), levels)


def _restrict(r):
    Nx, Ny = r.shape
    return r.reshape(Nx // 2, 2, Ny // 2, 2).sum(axis=(1, 3))


def _prolong(e, shape):
    Nx, Ny = shape
    return jnp.repeat(jnp.repeat(e, 2, axis=0), 2, axis=1)[:Nx, :Ny]


def _agg_matrix(n, dtype):
    """(n/2, n) 2->1 aggregation matrix: R[i, 2i] = R[i, 2i+1] = 1.

    Lets restriction/prolongation run as matmuls (R r R'; R' e R) — the
    Mosaic-friendly formulation: reshapes that split the lane dimension are
    unsupported inside Pallas kernels. Built from broadcasted_iota (not a
    host constant) because pallas_call forbids captured array constants."""
    row = jax.lax.broadcasted_iota(jnp.int32, (n // 2, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n // 2, n), 1)
    return ((col == 2 * row) | (col == 2 * row + 1)).astype(dtype)


_HI = jax.lax.Precision.HIGHEST  # MXU defaults to bf16 inputs; the grid
# transfers carry full-precision residuals, so force f32 multiplies.


def _mm2d(A, r, Bt):
    """A @ r @ Bt for a 2-D field or a leading-batch (B, Nx, Ny) stack.

    Batched matmuls are unrolled over the leading dim: Mosaic lowers a
    rank-3 `jnp.matmul` through a sublane->lane merging reshape
    ((B, Nx, Ny) -> (Nx, B*Ny)), which is an unsupported shape cast; plain
    2-D matmuls (the per-member kernel's proven path) lower cleanly."""
    if r.ndim == 2:
        return jnp.matmul(jnp.matmul(A, r, precision=_HI), Bt, precision=_HI)
    rows = [jnp.matmul(jnp.matmul(A, r[i], precision=_HI), Bt, precision=_HI)
            for i in range(r.shape[0])]
    return jnp.stack(rows)


def _restrict_mm(r):
    Rx = _agg_matrix(r.shape[-2], r.dtype)
    Ry = _agg_matrix(r.shape[-1], r.dtype)
    return _mm2d(Rx, r, Ry.T)


def _prolong_mm(e, shape):
    Rx = _agg_matrix(shape[-2], e.dtype)
    Ry = _agg_matrix(shape[-1], e.dtype)
    return _mm2d(Rx.T, e, Ry)


def _jacobi(TX, TY, diag, x, b, sweeps, omega=0.7):
    for _ in range(sweeps):
        x = x + omega * (b - stencil_matvec(TX, TY, diag, x)) / diag
    return x


def _dense_coarse_matrix(TX, TY, diag):
    """Materialize the coarsest operator by applying it to the identity."""
    n = diag.size
    eye = jnp.eye(n, dtype=diag.dtype).reshape(n, *diag.shape)
    cols = jax.vmap(lambda e: stencil_matvec(TX, TY, diag, e).reshape(-1))(eye)
    return cols.T  # symmetric anyway


def coarse_inverse(hierarchy):
    """Inverse of the coarsest operator via guarded Newton-Schulz
    (custom-call-free; spd_inverse diagonally scales internally, which the
    high-contrast coarse matrix needs). Precomputed once per pressure solve;
    applied as one small GEMV per V-cycle.

    The f32 jitter must *bound the scaled condition number* so the Newton-
    Schulz iteration stays convergent at f32: extreme members reach scaled
    cond ~1e6 (smallest scaled eigenvalue ~2.5e-6 < the old 1e-6 jitter),
    where the iteration diverged to NaN and poisoned the whole V-cycle
    (member-4 incident: production series off by 0.37). 1e-4 caps cond at
    ~2e4; the slightly-regularized coarse solve is still an excellent
    preconditioner component."""
    Acoarse = _dense_coarse_matrix(*hierarchy[-1])
    eps = 1e-4 if Acoarse.dtype == jnp.float32 else 1e-12
    return spd_inverse(Acoarse, jitter=eps)


def _coarse_apply_unrolled(Ainv3, b):
    """y = unvec(Ainv @ vec(b)) without any reshape of runtime data.

    `Ainv3` is the coarse inverse with its *rows* unflattened to (n, Nc, Mc)
    (reshaped outside the kernel). Each output entry is an elementwise
    multiply + full reduction; the (Nc, Mc) result is assembled from
    iota-generated one-hots (pallas_call forbids captured array constants).
    n <= ~64, fully unrolled — trivial VPU work, Mosaic-safe."""
    n, Nc, Mc = Ainv3.shape[-3:]
    row = jax.lax.broadcasted_iota(jnp.int32, (Nc, Mc), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (Nc, Mc), 1)
    y = jnp.zeros_like(b)
    for r in range(n):
        onehot = ((row == r // Mc) & (col == r % Mc)).astype(b.dtype)
        # Reduce one axis at a time (a multi-axis keepdims sum lowers via a
        # rank-1 vector, which aborts Mosaic layout inference) and broadcast
        # back to full size immediately, while the reduced value still has
        # Mosaic's replicated layout (a later concrete (B,1,1)->(B,Nc,Mc)
        # broadcast is "Not implemented: Broadcast in both sublanes+lanes").
        s = Ainv3[..., r, :, :] * b
        for ax in range(s.ndim - 1, s.ndim - 3, -1):
            s = jnp.sum(s, axis=ax, keepdims=True)
        y = y + jnp.broadcast_to(s, b.shape) * onehot
    return y


def vcycle_apply(hierarchy, Ainv, b, nu=2, omega=0.7, mosaic=False, omega_c=1.4):
    """One V-cycle from a zero initial guess: b -> approx A^{-1} b.

    Pure jnp on values — usable both under XLA and inside a Pallas kernel
    (ops/pressure_pallas.py, pass mosaic=True there: grid transfers become
    matmuls and the coarse solve unrolls, avoiding lane-splitting reshapes
    that Mosaic cannot lower). With mosaic=True, `Ainv` must be the
    row-unflattened (n, Nc, Mc) form."""
    restrict = _restrict_mm if mosaic else _restrict
    prolong = _prolong_mm if mosaic else _prolong

    def coarse(b):
        if mosaic:
            return _coarse_apply_unrolled(Ainv, b)
        return (Ainv @ b.reshape(-1)).reshape(b.shape)

    def cycle(b, lvl):
        TX, TY, diag = hierarchy[lvl]
        if lvl == len(hierarchy) - 1:
            return coarse(b)
        x = _jacobi(TX, TY, diag, jnp.zeros_like(b), b, nu, omega)
        r = b - stencil_matvec(TX, TY, diag, x)
        ec = cycle(restrict(r), lvl + 1)
        # Constant-aggregation coarse spaces systematically under-correct;
        # the standard fix is over-correction (omega_c ~ 1.5-1.9), which
        # markedly improves the cycle's contraction at no extra cost.
        x = x + omega_c * prolong(ec, b.shape)
        x = _jacobi(TX, TY, diag, x, b, nu, omega)
        return x

    return cycle(b, 0)


def vcycle_solver(hierarchy, nu=2, omega=0.7, omega_c=1.4):
    """Return M_inv: b -> approx A^{-1} b (one V-cycle, zero initial guess).

    The returned closure is a fixed SPD preconditioner suitable for PCG.
    """
    Ainv = coarse_inverse(hierarchy)
    return lambda b: vcycle_apply(hierarchy, Ainv, b, nu, omega, omega_c=omega_c)
