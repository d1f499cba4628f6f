"""Lane-packed member layout: P members side-by-side on the 128-lane axis.

Why: at the flagship 64x64 grid every (Nx, Ny) field op uses only Ny = 64 of
the VPU's 128 lanes — Mosaic pads the minormost dim to the lane width, so
HALF the vector throughput computes padding. Packing P = 128 // Ny members
into one lane row ((B, Nx, Ny) -> (B/P, Nx, P*Ny)) fills the lanes.

Correctness trick: all Y-direction coupling flows through *face* arrays
(transmissibilities, fluxes). In the packed layout these are stored
full-width with face j = coupling(cell j, cell j+1) and a ZERO at each
member's last column (the "seam"), so the uniform lane-shift stencil ops
cannot leak across members — the seam face multiplies any cross-member term
by 0 exactly. X-direction ops act on the leading (non-lane) axis and never
cross members.

All functions are pure jnp, usable under XLA and inside Pallas kernels
(shift = pad+slice, no scatter; reductions one axis at a time; grouped
per-member scalars via lane masks built from broadcasted_iota).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pack_cells(x, P):
    """(B, Nx, Ny) cell fields -> (B/P, Nx, P*Ny)."""
    B, Nx, Ny = x.shape
    assert B % P == 0, (B, P)
    return x.reshape(B // P, P, Nx, Ny).transpose(0, 2, 1, 3).reshape(B // P, Nx, P * Ny)


def unpack_cells(xp, P):
    """Inverse of pack_cells."""
    G, Nx, W = xp.shape
    Ny = W // P
    return xp.reshape(G, Nx, P, Ny).transpose(0, 2, 1, 3).reshape(G * P, Nx, Ny)


def pack_faces_y(ty, P):
    """(B, Nx, Ny-1) y-face fields -> (B/P, Nx, P*Ny) with a zero seam at
    each member's last column (face j couples packed columns j and j+1)."""
    B, Nx, Nym1 = ty.shape
    ty_full = jnp.pad(ty, ((0, 0), (0, 0), (0, 1)))  # zero member-boundary face
    return pack_cells(ty_full, P)


def pack_faces_x(tx, P):
    """(B, Nx-1, Ny) x-face fields -> (B/P, Nx, P*Ny) with a zero last row
    (face i couples packed rows i and i+1)."""
    B, Nxm1, Ny = tx.shape
    tx_full = jnp.pad(tx, ((0, 0), (0, 1), (0, 0)))
    return pack_cells(tx_full, P)


def _shift_down(a):
    """out[..., i, :] = a[..., i-1, :] (zero row in)."""
    return jnp.pad(a, [(0, 0)] * (a.ndim - 2) + [(1, 0), (0, 0)])[..., :-1, :]


def _shift_up(a):
    return jnp.pad(a, [(0, 0)] * (a.ndim - 2) + [(0, 1), (0, 0)])[..., 1:, :]


def _shift_right(a):
    """out[..., j] = a[..., j-1] (zero column in)."""
    return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(1, 0)])[..., :-1]


def _shift_left(a):
    return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, 1)])[..., 1:]


def stencil_matvec_packed(TXf, TYf, diag, p):
    """A @ p for the packed 5-point operator; ALL arrays share one shape.

    TXf[..., i, :] couples rows i, i+1 (last row zero); TYf[..., :, j]
    couples columns j, j+1 (member-seam and last columns zero). Equivalent
    to `stencil.stencil_matvec` member-by-member (tested)."""
    out = diag * p
    out = out - TXf * _shift_up(p) - _shift_down(TXf * p)
    out = out - TYf * _shift_left(p) - _shift_right(TYf * p)
    return out


def face_fluxes_packed(TXf, TYf, p):
    """Packed Darcy fluxes, stored ON the face arrays' own grid:
    Fx[..., i, :] = flux across face (i, i+1) = TXf * (p_i - p_{i+1});
    Fy[..., :, j] = flux across face (j, j+1). Boundary/seam faces carry
    TXf/TYf = 0, hence zero flux — no masks needed anywhere downstream."""
    Fx = TXf * (p - _shift_up(p))
    Fy = TYf * (p - _shift_left(p))
    return Fx, Fy


def lane_group_masks(shape, P, dtype):
    """P boolean lane masks (one per packed member) of the given field shape.
    Built from broadcasted_iota (Pallas forbids captured array constants)."""
    W = shape[-1]
    Ny = W // P
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    return [(lane // Ny) == g for g in range(P)]


def grouped_vdot(u, v, P):
    """Per-packed-member dot products, returned broadcast to full field
    shape (each member's lanes carry its own scalar).

    Scheme (Mosaic layout discipline, see ops/cg.py): reduce every non-lane
    axis one at a time with keepdims, leaving a lane vector (..., 1, W) of
    per-lane column sums; then aggregate each member's Ny-lane block AND
    broadcast the total back across those lanes in one step by multiplying
    with a block-diagonal 0/1 aggregation matrix G (W, W), G[a, b] = 1 iff
    lanes a, b belong to the same member — a single MXU matmul, avoiding
    lane-axis reductions (unsupported/expensive in Mosaic).
    """
    s = u * v
    # Reduce all axes except the lane axis — and except a leading BATCH axis
    # when rank >= 3 (the blocked kernel carries (block, Nx, W) fields; each
    # block row holds different members).
    stop = 1 if s.ndim >= 3 else 0
    for ax in range(s.ndim - 2, stop - 1, -1):
        s = jnp.sum(s, axis=ax, keepdims=True)
    # s: (..., 1, W) per-lane sums. G[w1, w2] = 1 iff same member block:
    W = s.shape[-1]
    Ny = W // P
    r1 = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0) // Ny
    r2 = jax.lax.broadcasted_iota(jnp.int32, (W, W), 1) // Ny
    G = (r1 == r2).astype(s.dtype)
    hi = jax.lax.Precision.HIGHEST
    if s.ndim == 2:
        tot = jnp.matmul(s, G, precision=hi)
    else:
        # Unrolled over the (small, static) block axis: Mosaic lowers rank-3
        # matmuls through an unsupported sublane->lane merging reshape.
        tot = jnp.stack([jnp.matmul(s[i], G, precision=hi)
                         for i in range(s.shape[0])])
    return jnp.broadcast_to(tot, u.shape)
