"""TPFA 5-point stencil: transmissibilities, diagonal, matrix-free matvec.

This replaces the reference simulator's scipy.sparse assembly + spsolve
(SURVEY.md S1.8 [inferred]) with a matrix-free operator: the TPFA system is
fully described by inner-face transmissibilities (TX, TY) and its diagonal,
and `A @ p` is a handful of shifted elementwise multiply-adds that XLA fuses
into a single VPU pass. No sparse formats, no gather/scatter — ideal for
batching over ensemble members with `vmap`.

Singularity handling: the incompressible TPFA system with balanced sources is
singular (nullspace = constants). We add `pin` to the diagonal entry of cell
(0,0). For a balanced RHS q (1'q = 0) the solution of the pinned SPD system
*exactly* solves A p = q with p[0,0] = 0: taking 1'(A p + pin*p00*e00) = 1'q
gives pin*p00 = 0. (Same device as the Matlab origin's A(1,1) bump.)
"""

from __future__ import annotations

import jax.numpy as jnp


def transmissibilities(Kx, Ky, hx, hy):
    """Harmonic-average inner-face transmissibilities.

    Kx, Ky: (Nx, Ny) direction permeabilities (already scaled by total
    mobility for the two-phase pressure equation). Returns
    TX: (Nx-1, Ny) coupling cell (i,:) <-> (i+1,:),
    TY: (Nx, Ny-1) coupling cell (:,j) <-> (:,j+1).
    Face geometric factors use hz = 1: tx = 2*hy/hx, ty = 2*hx/hy.
    """
    tx = 2.0 * hy / hx
    ty = 2.0 * hx / hy
    TX = tx / (1.0 / Kx[:-1, :] + 1.0 / Kx[1:, :])
    TY = ty / (1.0 / Ky[:, :-1] + 1.0 / Ky[:, 1:])
    return TX, TY


def stencil_diag_nopin(TX, TY):
    """Unpinned diagonal: sum of adjacent face transmissibilities."""
    Nx = TX.shape[0] + 1
    Ny = TY.shape[1] + 1
    diag = jnp.zeros((Nx, Ny), dtype=TX.dtype)
    diag = diag.at[:-1, :].add(TX)
    diag = diag.at[1:, :].add(TX)
    diag = diag.at[:, :-1].add(TY)
    diag = diag.at[:, 1:].add(TY)
    return diag


def stencil_diag(TX, TY, pin=None):
    """Diagonal of the TPFA matrix: sum of adjacent face transmissibilities,
    plus the `pin` anchor on cell (0,0). If pin is None, uses the mean of the
    unpinned diagonal (scale-invariant, keeps conditioning sane)."""
    diag = stencil_diag_nopin(TX, TY)
    if pin is None:
        pin = jnp.mean(diag)
    return diag.at[0, 0].add(pin)


def stencil_matvec(TX, TY, diag, p):
    """A @ p for the 5-point TPFA operator. p: [..., Nx, Ny] (any leading
    batch dims, matching TX/TY/diag).

    Written as pad-and-add (no scatter): identical XLA code, and required
    for tracing inside Pallas kernels (Mosaic has no scatter-add)."""
    z = [(0, 0)] * (p.ndim - 2)
    out = diag * p
    out = out - jnp.pad(TX * p[..., 1:, :], z + [(0, 1), (0, 0)])
    out = out - jnp.pad(TX * p[..., :-1, :], z + [(1, 0), (0, 0)])
    out = out - jnp.pad(TY * p[..., :, 1:], z + [(0, 0), (0, 1)])
    out = out - jnp.pad(TY * p[..., :, :-1], z + [(0, 0), (1, 0)])
    return out


def _two_sum(a, b):
    """Error-free addition (Knuth 2Sum): a + b = s + err exactly."""
    s = a + b
    bv = s - a
    err = (a - (s - bv)) + (b - bv)
    return s, err


def _two_prod(a, b):
    """Error-free product (Dekker split, float32 splitter 2^12+1):
    a * b = p + e exactly. Verified to survive XLA on this TPU backend."""
    c = jnp.asarray(4097.0, a.dtype) * a
    hi = c - (c - a)
    lo = a - hi
    p = a * b
    e = (hi * b - p) + lo * b
    return p, e


def stencil_residual_ds(TX, TY, diag, p, b):
    """Compensated (double-single) residual r = b - A p for the 5-point
    operator.

    Why: the plain float32 residual loses ~eps * max|T_i p_i| to cancellation
    — at permeability contrast 1e4-1e7 that floor (measured ~1e-2..1 relative)
    is what stalls the CG solves. Every product is an error-free Dekker
    two-prod and the sum is Neumaier-accumulated, pushing the residual floor
    down by roughly the contrast factor for ~6x the matvec's elementwise ops.
    Used only in the residual-replacement step (once per `restart_every`
    iterations), so the per-solve overhead is a few percent.
    """
    z = [(0, 0)] * (p.ndim - 2)

    def padded_prod(T, pn, spec):
        hi, lo = _two_prod(T, pn)
        return jnp.pad(hi, z + spec), jnp.pad(lo, z + spec)

    terms = [
        padded_prod(TX, p[..., 1:, :], [(0, 1), (0, 0)]),
        padded_prod(TX, p[..., :-1, :], [(1, 0), (0, 0)]),
        padded_prod(TY, p[..., :, 1:], [(0, 0), (0, 1)]),
        padded_prod(TY, p[..., :, :-1], [(0, 0), (1, 0)]),
    ]
    dhi, dlo = _two_prod(diag, p)
    acc, comp = _two_sum(b, -dhi)
    comp = comp - dlo
    for hi, lo in terms:
        acc, e = _two_sum(acc, hi)
        comp = comp + (e + lo)
    return acc + comp


def face_fluxes(TX, TY, p):
    """Darcy face fluxes from a pressure field, padded with the zero-flux
    boundary. Positive flux = flow in the +x / +y direction.

    Returns Fx: (Nx+1, Ny) with Fx[i] the flux across the face between cells
    (i-1,:) and (i,:); Fy: (Nx, Ny+1) analogously.
    """
    Nx, Ny = p.shape
    fx = TX * (p[:-1, :] - p[1:, :])  # flow from i to i+1 when p decreases
    fy = TY * (p[:, :-1] - p[:, 1:])
    Fx = jnp.zeros((Nx + 1, Ny), dtype=p.dtype).at[1:-1, :].set(fx)
    Fy = jnp.zeros((Nx, Ny + 1), dtype=p.dtype).at[:, 1:-1].set(fy)
    return Fx, Fy
