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


# Chebyshev smoothing interval, as fractions of the Gershgorin bound
# lam_max(D^-1 A) <= 2 (every level is a diagonally dominant 5-point
# operator: diag = row sums + pin, Galerkin-inherited). The lower edge
# targets the SMOOTHING range [lmax/4, lmax] — the V-cycle's coarse-grid
# correction owns the low modes. Probed on the flagship workload:
# (0.5, 2.0) and (0.25, 2.0) are equal-speed; tighter lower edges degrade.
CHEB_BOUNDS = (0.5, 2.0)


def _cheb(mv, diag, x, b, sweeps, bounds=CHEB_BOUNDS):
    """`sweeps`-degree Chebyshev(1st kind) polynomial smoother on D^-1 A.

    Same cost per sweep as damped Jacobi (one matvec + one D^-1 apply) but
    with the optimal polynomial damping over [lmin, lmax] instead of a fixed
    single-sweep factor — a standard multigrid smoother upgrade (hypre/PyAMG
    convention; coefficients from the standard three-term recurrence). All
    recurrence coefficients are Python floats (static), so the smoother is a
    fixed linear polynomial in D^-1 A: applying the SAME polynomial pre- and
    post-sweep keeps the V-cycle a fixed SPD operator, exactly like Jacobi
    (any stationary polynomial smoother is PCG-admissible).
    """
    lmin, lmax = bounds
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma = theta / delta
    rho = 1.0 / sigma
    r = b - mv(x)
    d = (r / diag) * (1.0 / theta)
    x = x + d
    for _ in range(sweeps - 1):
        r = r - mv(d)
        rho_new = 1.0 / (2.0 * sigma - rho)
        d = (rho_new * rho) * d + (2.0 * rho_new / delta) * (r / diag)
        x = x + d
        rho = rho_new
    return x


def _smooth(TX, TY, diag, x, b, sweeps, omega, smoother):
    if smoother == "cheb":
        return _cheb(lambda v: stencil_matvec(TX, TY, diag, v), diag, x, b,
                     sweeps)
    return _jacobi(TX, TY, diag, x, b, sweeps, omega)


def _dense_coarse_matrix(TX, TY, diag):
    """Materialize the coarsest operator by applying it to the identity."""
    n = diag.size
    eye = jnp.eye(n, dtype=diag.dtype).reshape(n, *diag.shape)
    cols = jax.vmap(lambda e: stencil_matvec(TX, TY, diag, e).reshape(-1))(eye)
    return cols.T  # symmetric anyway


def coarse_inverse(hierarchy, x0=None):
    """Inverse of the coarsest operator via guarded Newton-Schulz
    (custom-call-free; spd_inverse diagonally scales internally, which the
    high-contrast coarse matrix needs). Precomputed once per pressure solve;
    applied as one small GEMV per V-cycle. `x0`: optional warm start — a
    nearby operator's inverse, e.g. the previous time step's
    (`simulate(coarse_warm=True)`): same floor-converged result, far fewer
    Newton-Schulz GEMMs.

    The f32 jitter must *bound the scaled condition number* so the Newton-
    Schulz iteration stays convergent at f32: extreme members reach scaled
    cond ~1e6 (smallest scaled eigenvalue ~2.5e-6 < the old 1e-6 jitter),
    where the iteration diverged to NaN and poisoned the whole V-cycle
    (member-4 incident: production series off by 0.37). 1e-4 caps cond at
    ~2e4; the slightly-regularized coarse solve is still an excellent
    preconditioner component."""
    Acoarse = _dense_coarse_matrix(*hierarchy[-1])
    eps = 1e-4 if Acoarse.dtype == jnp.float32 else 1e-12
    return spd_inverse(Acoarse, jitter=eps, x0=x0)


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


def vcycle_apply(hierarchy, Ainv, b, nu=2, omega=0.7, mosaic=False, omega_c=1.4,
                 smoother="jacobi"):
    """One V-cycle from a zero initial guess: b -> approx A^{-1} b.

    Pure jnp on values — usable both under XLA and inside a Pallas kernel
    (ops/pressure_pallas.py, pass mosaic=True there: grid transfers become
    matmuls and the coarse solve unrolls, avoiding lane-splitting reshapes
    that Mosaic cannot lower). With mosaic=True, `Ainv` must be the
    row-unflattened (n, Nc, Mc) form. `smoother`: "jacobi" (damped, `omega`)
    or "cheb" (degree-`nu` Chebyshev — see `_cheb`)."""
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
        x = _smooth(TX, TY, diag, jnp.zeros_like(b), b, nu, omega, smoother)
        r = b - stencil_matvec(TX, TY, diag, x)
        ec = cycle(restrict(r), lvl + 1)
        # Constant-aggregation coarse spaces systematically under-correct;
        # the standard fix is over-correction (omega_c ~ 1.5-1.9), which
        # markedly improves the cycle's contraction at no extra cost.
        x = x + omega_c * prolong(ec, b.shape)
        x = _smooth(TX, TY, diag, x, b, nu, omega, smoother)
        return x

    return cycle(b, 0)


# -- lane-packed variant (P members per lane row; see ops/packed.py) -----------


def _agg_matrix_grouped(n, P, dtype):
    """(n/2, n) 2->1 aggregation WITHIN each of P equal lane blocks: coarse
    packed lane c belongs to member g = c // (n/2/P) at block-local offset
    j = c - g*(n/2/P), and sums fine lanes g*(n/P) + 2j and + 2j + 1 —
    aggregation never crosses a member seam. Built from iota (Pallas
    forbids captured array constants)."""
    nc = n // 2
    ny_c = nc // P  # coarse per-member width
    row = jax.lax.broadcasted_iota(jnp.int32, (nc, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (nc, n), 1)
    g = row // ny_c
    j = row - g * ny_c
    fine = g * (2 * ny_c) + 2 * j
    return ((col == fine) | (col == fine + 1)).astype(dtype)


def _mm_rows(A, r):
    """A @ r over the row (second-minor) axis, unrolled over a leading batch
    axis (Mosaic can't lower rank-3 matmul)."""
    if r.ndim == 2:
        return jnp.matmul(A, r, precision=_HI)
    return jnp.stack([jnp.matmul(A, r[i], precision=_HI) for i in range(r.shape[0])])


def _mm_lanes(r, Bt):
    if r.ndim == 2:
        return jnp.matmul(r, Bt, precision=_HI)
    return jnp.stack([jnp.matmul(r[i], Bt, precision=_HI) for i in range(r.shape[0])])


def _restrict_packed(r, P):
    Rx = _agg_matrix(r.shape[-2], r.dtype)
    Ry = _agg_matrix_grouped(r.shape[-1], P, r.dtype)
    return _mm_lanes(_mm_rows(Rx, r), Ry.T)


def _prolong_packed(e, shape, P):
    Rx = _agg_matrix(shape[-2], e.dtype)
    Ry = _agg_matrix_grouped(shape[-1], P, e.dtype)
    return _mm_lanes(_mm_rows(Rx.T, e), Ry)


def _jacobi_packed(TXf, TYf, diag, x, b, sweeps, omega):
    from historymatching_tpu.ops.packed import stencil_matvec_packed

    for _ in range(sweeps):
        x = x + omega * (b - stencil_matvec_packed(TXf, TYf, diag, x)) / diag
    return x


def _smooth_packed(TXf, TYf, diag, x, b, sweeps, omega, smoother):
    if smoother == "cheb":
        from historymatching_tpu.ops.packed import stencil_matvec_packed

        return _cheb(lambda v: stencil_matvec_packed(TXf, TYf, diag, v),
                     diag, x, b, sweeps)
    return _jacobi_packed(TXf, TYf, diag, x, b, sweeps, omega)


def _coarse_apply_packed(Ainv3p, b, P):
    """Grouped coarse solve: `Ainv3p` (P*n_loc, Nc, Wc) holds each member's
    inverse rows placed in ITS OWN lane block (zeros elsewhere), so the full
    reduction per row picks up only that member's residual entries — the
    zero-padding replaces per-member masking. Unrolled like
    `_coarse_apply_unrolled` (same Mosaic constraints)."""
    n_rows, Nc, Wc = Ainv3p.shape[-3:]
    ny_c = Wc // P
    row = jax.lax.broadcasted_iota(jnp.int32, (Nc, Wc), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (Nc, Wc), 1)
    y = jnp.zeros_like(b)
    n_loc = n_rows // P
    for r in range(n_rows):
        g, rl = r // n_loc, r % n_loc
        # target cell of member g for local row rl: (rl // ny_c, rl % ny_c)
        onehot = ((row == rl // ny_c) & (col == g * ny_c + rl % ny_c)).astype(b.dtype)
        s = Ainv3p[..., r, :, :] * b
        for ax in range(s.ndim - 1, s.ndim - 3, -1):
            s = jnp.sum(s, axis=ax, keepdims=True)
        y = y + jnp.broadcast_to(s, b.shape) * onehot
    return y


def vcycle_apply_packed(hierarchy, Ainv3p, b, P, nu=2, omega=0.7, omega_c=1.4,
                        smoother="jacobi"):
    """One V-cycle in the lane-packed layout (hierarchy levels are packed
    full-width face/diag triples; see ops/packed.py). Pure jnp — used inside
    the packed Pallas pressure kernel and testable under XLA/interpret."""

    def cycle(b, lvl):
        TXf, TYf, diag = hierarchy[lvl]
        if lvl == len(hierarchy) - 1:
            return _coarse_apply_packed(Ainv3p, b, P)
        from historymatching_tpu.ops.packed import stencil_matvec_packed

        x = _smooth_packed(TXf, TYf, diag, jnp.zeros_like(b), b, nu, omega,
                           smoother)
        r = b - stencil_matvec_packed(TXf, TYf, diag, x)
        ec = cycle(_restrict_packed(r, P), lvl + 1)
        x = x + omega_c * _prolong_packed(ec, b.shape, P)
        x = _smooth_packed(TXf, TYf, diag, x, b, nu, omega, smoother)
        return x

    return cycle(b, 0)


def pack_hierarchy(hier_members, P):
    """Per-member hierarchy ((N, ...) leaves, from vmapped
    build_hierarchy_5pt) -> packed full-width levels + packed coarse inverse
    rows. XLA-land (runs outside the kernel)."""
    from historymatching_tpu.ops.packed import pack_cells, pack_faces_x, pack_faces_y

    packed = []
    for TX, TY, diag in hier_members:
        packed.append((pack_faces_x(TX, P), pack_faces_y(TY, P), pack_cells(diag, P)))

    # Coarse inverse per member: (N, n_loc, n_loc) -> packed zero-padded rows
    # (N/P, P*n_loc, Nc, Wc).
    TXc, TYc, diagc = hier_members[-1]
    N = diagc.shape[0]
    Nc, Myc = diagc.shape[-2:]
    n_loc = Nc * Myc
    Ainv = jax.vmap(lambda tx, ty, d: spd_inverse(
        _dense_coarse_matrix(tx, ty, d),
        jitter=1e-4 if d.dtype == jnp.float32 else 1e-12,
    ))(TXc, TYc, diagc)  # (N, n_loc, n_loc)
    return packed, pack_coarse_inv(Ainv.reshape(N, n_loc, Nc, Myc), P)


def pack_coarse_inv(rows, P):
    """Row-unflattened per-member coarse inverses (N, n_loc, Nc, Myc) ->
    grouped zero-padded form (N/P, P*n_loc, Nc, P*Myc) for
    `_coarse_apply_packed` (member g's rows live in lane block g only)."""
    N, n_loc, Nc, Myc = rows.shape
    G = N // P
    rows = rows.reshape(G, P, n_loc, Nc, Myc)
    out = jnp.zeros((G, P, n_loc, Nc, P * Myc), rows.dtype)
    for g in range(P):
        out = out.at[:, g, :, :, g * Myc:(g + 1) * Myc].set(rows[:, g])
    return out.reshape(G, P * n_loc, Nc, P * Myc)


def vcycle_solver(hierarchy, nu=2, omega=0.7, omega_c=1.4, Ainv=None,
                  smoother="jacobi"):
    """Return M_inv: b -> approx A^{-1} b (one V-cycle, zero initial guess).

    The returned closure is a fixed SPD preconditioner suitable for PCG.
    `Ainv` (optional): a precomputed coarse inverse — e.g. one frozen per
    simulation pass (`simulate(freeze_coarse=True)`): the Newton-Schulz
    inverse is the priciest piece of the per-step preconditioner setup, and
    a slightly-stale coarse solve still preconditions well.
    """
    if Ainv is None:
        Ainv = coarse_inverse(hierarchy)
    return lambda b: vcycle_apply(hierarchy, Ainv, b, nu, omega,
                                  omega_c=omega_c, smoother=smoother)
