"""Pallas TPU kernels: fused upwind saturation transport.

The XLA path runs each CFL substep as ~a dozen separate HBM-roundtrip ops;
with 100+ substeps per outer time step (the CFL count is set by the
injector-cell pore-volume/influx ratio) that is thousands of small
bandwidth/latency-bound passes per step. These kernels run *all* substeps of
one outer step entirely in VMEM: saturation, fluxes and well sources are
loaded once, the `fori_loop` over substeps (dynamic trip count from SMEM)
does pure VPU work, and the final saturation is written once.

Two variants: a per-member kernel (no grid; `vmap` turns the member axis
into a grid dimension) and a block-batched kernel (`block` members per
Mosaic program, amortizing the small-op overhead; the block runs to its max
substep count with per-member live masks). `transport_substeps_vmappable`
exposes the per-member call whose custom-vmap rule dispatches the blocked
kernel — mirroring ops/pressure_pallas.py.

Numerics are identical to `models.ressim.transport_step`'s inner loop
(donor-cell upwinding, quadratic Corey relperm, per-substep clamp).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(vw, vo, swc, sor):
    def transport_upwind_kernel(nsub_ref, dtspv_ref, s_ref, fx_ref, fy_ref, q_ref, out_ref):
        n_sub = nsub_ref[0, 0]
        dts_pv = dtspv_ref[0, 0]  # (dt / n_sub) / pore_volume

        Fx = fx_ref[:]  # (Nx+1, Ny)
        Fy = fy_ref[:]  # (Nx, Ny+1)
        q = q_ref[:]  # (Nx, Ny)
        XP = jnp.maximum(Fx, 0.0)
        XN = jnp.minimum(Fx, 0.0)
        YP = jnp.maximum(Fy, 0.0)
        YN = jnp.minimum(Fy, 0.0)
        fi = jnp.maximum(q, 0.0)
        fp = jnp.minimum(q, 0.0)

        def substep(_, s):
            S = (s - swc) / (1.0 - swc - sor)
            Mw = S * S / vw
            Mo = (1.0 - S) * (1.0 - S) / vo
            fw = Mw / (Mw + Mo)
            fw_l = jnp.pad(fw, ((1, 0), (0, 0)))
            fw_r = jnp.pad(fw, ((0, 1), (0, 0)))
            Fw_x = XP * fw_l + XN * fw_r
            fw_d = jnp.pad(fw, ((0, 0), (1, 0)))
            fw_u = jnp.pad(fw, ((0, 0), (0, 1)))
            Fw_y = YP * fw_d + YN * fw_u
            div = (Fw_x[1:, :] - Fw_x[:-1, :]) + (Fw_y[:, 1:] - Fw_y[:, :-1])
            s_new = s + dts_pv * (fi + fp * fw - div)
            return jnp.clip(s_new, swc, 1.0 - sor)

        out_ref[:] = jax.lax.fori_loop(0, n_sub, substep, s_ref[:])

    return transport_upwind_kernel


@partial(jax.jit, static_argnames=("fluid_t", "interpret"))
def transport_substeps_pallas(s, Fx, Fy, q, dts_over_pv, n_sub, fluid_t, interpret=False):
    """Run all CFL substeps of one outer step for one member.

    s (Nx,Ny); Fx (Nx+1,Ny); Fy (Nx,Ny+1); q (Nx,Ny); dts_over_pv scalar
    (substep length / pore volume); n_sub scalar int. `fluid_t` =
    (vw, vo, swc, sor) static floats. vmap over the leading member axis for
    ensembles. `interpret=True` runs in interpreter mode (CPU testing).
    """
    vw, vo, swc, sor = (float(v) for v in fluid_t)
    Nx, Ny = s.shape
    return pl.pallas_call(
        _make_kernel(vw, vo, swc, sor),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Nx, Ny), s.dtype),
        interpret=interpret,
    )(
        jnp.reshape(n_sub, (1, 1)).astype(jnp.int32),
        jnp.reshape(dts_over_pv, (1, 1)).astype(s.dtype),
        s,
        Fx,
        Fy,
        q,
    )


def _make_kernel_batched(vw, vo, swc, sor, ndim):
    z = [(0, 0)] * (ndim - 2)

    def transport_upwind_batched_kernel(nmax_ref, nsub_ref, dtspv_ref, s_ref, fx_ref, fy_ref, q_ref, out_ref):
        # whole (nblocks, 1) SMEM array (grid-sliced SMEM blocks are
        # rejected by the TPU lowering); pick this program's entry.
        n_max = nmax_ref[pl.program_id(0), 0]
        nsub_f = nsub_ref[:]  # (B, Nx, Ny) float: per-member substep count
        dts_pv = dtspv_ref[:]  # (B, Nx, Ny): per-member (dt/n_sub)/pv

        Fx = fx_ref[:]  # (B, Nx+1, Ny)
        Fy = fy_ref[:]  # (B, Nx, Ny+1)
        q = q_ref[:]
        XP = jnp.maximum(Fx, 0.0)
        XN = jnp.minimum(Fx, 0.0)
        YP = jnp.maximum(Fy, 0.0)
        YN = jnp.minimum(Fy, 0.0)
        fi = jnp.maximum(q, 0.0)
        fp = jnp.minimum(q, 0.0)

        def substep(i, s):
            S = (s - swc) / (1.0 - swc - sor)
            Mw = S * S / vw
            Mo = (1.0 - S) * (1.0 - S) / vo
            fw = Mw / (Mw + Mo)
            fw_l = jnp.pad(fw, z + [(1, 0), (0, 0)])
            fw_r = jnp.pad(fw, z + [(0, 1), (0, 0)])
            Fw_x = XP * fw_l + XN * fw_r
            fw_d = jnp.pad(fw, z + [(0, 0), (1, 0)])
            fw_u = jnp.pad(fw, z + [(0, 0), (0, 1)])
            Fw_y = YP * fw_d + YN * fw_u
            div = (Fw_x[..., 1:, :] - Fw_x[..., :-1, :]) + (
                Fw_y[..., :, 1:] - Fw_y[..., :, :-1]
            )
            s_new = jnp.clip(s + dts_pv * (fi + fp * fw - div), swc, 1.0 - sor)
            # Members whose CFL count is done freeze (full-size float mask;
            # no i1 carries / rank-1 vectors — see pcg_batched's Mosaic rules)
            live = i.astype(nsub_f.dtype) < nsub_f
            return jnp.where(live, s_new, s)

        out_ref[:] = jax.lax.fori_loop(0, n_max, substep, s_ref[:])

    return transport_upwind_batched_kernel


@partial(jax.jit, static_argnames=("fluid_t", "block", "interpret"))
def transport_substeps_pallas_batched(s, Fx, Fy, q, dts_over_pv, n_sub, fluid_t,
                                      block=8, interpret=False):
    """Blocked variant: leading member axis (N, ...) on every field input;
    `dts_over_pv`, `n_sub` are (N,) per-member scalars. N % block == 0.
    Each Mosaic program advances `block` members to the block's max substep
    count with per-member freeze masks."""
    vw, vo, swc, sor = (float(v) for v in fluid_t)
    N, Nx, Ny = s.shape
    assert N % block == 0, (N, block)
    nblocks = N // block
    n_sub = n_sub.astype(jnp.int32)
    nmax = jnp.max(n_sub.reshape(nblocks, block), axis=1).reshape(nblocks, 1)
    # Per-member scalars ride VMEM broadcast to field shape (Mosaic carries
    # full-size values cleanly; (B,1,1) scalars hit layout-inference walls).
    nsub_f = jnp.broadcast_to(n_sub.astype(s.dtype)[:, None, None], s.shape)
    dts_f = jnp.broadcast_to(dts_over_pv.astype(s.dtype)[:, None, None], s.shape)

    def bspec(x):
        return pl.BlockSpec((block,) + x.shape[1:], lambda i: (i,) + (0,) * (x.ndim - 1))

    return pl.pallas_call(
        _make_kernel_batched(vw, vo, swc, sor, s.ndim),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            bspec(nsub_f),
            bspec(dts_f),
            bspec(s),
            bspec(Fx),
            bspec(Fy),
            bspec(q),
        ],
        out_specs=bspec(s),
        out_shape=jax.ShapeDtypeStruct(s.shape, s.dtype),
        interpret=interpret,
    )(nmax, nsub_f, dts_f, s, Fx, Fy, q)


def _make_kernel_packed(vw, vo, swc, sor):
    from historymatching_tpu.ops.packed import (
        _shift_down,
        _shift_left,
        _shift_right,
        _shift_up,
    )

    def transport_upwind_packed_kernel(nmax_ref, nsub_ref, dtspv_ref, s_ref, fxf_ref, fyf_ref, q_ref, out_ref):
        n_max = nmax_ref[pl.program_id(0), 0]
        nsub_f = nsub_ref[:]   # (G, Nx, W) per-member substep counts (float)
        dts_pv = dtspv_ref[:]  # (G, Nx, W)

        # Face-form fluxes: fxf[..., i, :] crosses rows (i, i+1) (last row
        # zero); fyf[..., :, j] crosses columns (j, j+1) (member-seam and
        # last columns zero — cross-member leakage is killed exactly).
        Fxf = fxf_ref[:]
        Fyf = fyf_ref[:]
        q = q_ref[:]
        XPf = jnp.maximum(Fxf, 0.0)
        XNf = jnp.minimum(Fxf, 0.0)
        YPf = jnp.maximum(Fyf, 0.0)
        YNf = jnp.minimum(Fyf, 0.0)
        fi = jnp.maximum(q, 0.0)
        fp = jnp.minimum(q, 0.0)

        def substep(i, s):
            S = (s - swc) / (1.0 - swc - sor)
            Mw = S * S / vw
            Mo = (1.0 - S) * (1.0 - S) / vo
            fw = Mw / (Mw + Mo)
            # donor-cell upwinding on face-form fluxes
            Fw_xf = XPf * fw + XNf * _shift_up(fw)
            Fw_yf = YPf * fw + YNf * _shift_left(fw)
            div = (Fw_xf - _shift_down(Fw_xf)) + (Fw_yf - _shift_right(Fw_yf))
            s_new = jnp.clip(s + dts_pv * (fi + fp * fw - div), swc, 1.0 - sor)
            live = i.astype(nsub_f.dtype) < nsub_f
            return jnp.where(live, s_new, s)

        out_ref[:] = jax.lax.fori_loop(0, n_max, substep, s_ref[:])

    return transport_upwind_packed_kernel


@partial(jax.jit, static_argnames=("fluid_t", "P", "block_pairs", "interpret"))
def transport_substeps_pallas_packed(s, Fx, Fy, q, dts_over_pv, n_sub, fluid_t,
                                     P, block_pairs=16, interpret=False):
    """Lane-packed blocked transport: P members per 128-lane row (see
    ops/packed.py). Member-leading inputs ((N, Nx, Ny) fields, (N, Nx+1, Ny)
    / (N, Nx, Ny+1) fluxes, (N,) scalars); packing/unpacking happens here
    (XLA-land).

    Contract: boundary faces of Fx/Fy must be ZERO (face_fluxes always
    emits them so — the simulator guarantees this); the face-form packing
    drops the leading boundary face and reuses the trailing one as the
    lane seam."""
    from historymatching_tpu.ops.packed import pack_cells, unpack_cells

    vw, vo, swc, sor = (float(v) for v in fluid_t)
    N, Nx, Ny = s.shape
    group = P * block_pairs
    assert N % group == 0, (N, group)
    n_sub = n_sub.astype(jnp.int32)
    G = N // P
    nblocks = G // block_pairs
    # face-form: drop the leading zero-boundary face; the trailing one is the
    # member's own zero column/row, which doubles as the pack seam.
    Fxf = pack_cells(Fx[:, 1:, :], P)
    Fyf = pack_cells(Fy[:, :, 1:], P)
    sp = pack_cells(s, P)
    qp = pack_cells(q, P)
    nsub_f = pack_cells(
        jnp.broadcast_to(n_sub.astype(s.dtype)[:, None, None], s.shape), P
    )
    dts_f = pack_cells(
        jnp.broadcast_to(dts_over_pv.astype(s.dtype)[:, None, None], s.shape), P
    )
    nmax = jnp.max(n_sub.reshape(nblocks, group), axis=1).reshape(nblocks, 1)

    def bspec(x):
        return pl.BlockSpec((block_pairs,) + x.shape[1:],
                            lambda i: (i,) + (0,) * (x.ndim - 1))

    out = pl.pallas_call(
        _make_kernel_packed(vw, vo, swc, sor),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            bspec(nsub_f),
            bspec(dts_f),
            bspec(sp),
            bspec(Fxf),
            bspec(Fyf),
            bspec(qp),
        ],
        out_specs=bspec(sp),
        out_shape=jax.ShapeDtypeStruct(sp.shape, s.dtype),
        interpret=interpret,
    )(nmax, nsub_f, dts_f, sp, Fxf, Fyf, qp)
    return unpack_cells(out, P)


def transport_substeps_vmappable(s, Fx, Fy, q, dts_over_pv, n_sub, *, fluid_t,
                                 block=8, interpret=False, packed=True):
    """Per-member transport whose `vmap` rule is the blocked kernel
    (mirrors pressure_solve_vmappable; `packed` is the same explicit static
    lane-packing knob — no env reads at trace time)."""

    @jax.custom_batching.custom_vmap
    def run(s, Fx, Fy, q, dts_over_pv, n_sub):
        return transport_substeps_pallas(s, Fx, Fy, q, dts_over_pv, n_sub,
                                         fluid_t, interpret=interpret)

    @run.def_vmap
    def _rule(axis_size, in_batched, s, Fx, Fy, q, dts_over_pv, n_sub):
        args = [s, Fx, Fy, q, dts_over_pv, n_sub]
        out = []
        for x, batched in zip(args, in_batched):
            out.append(x if batched else jnp.broadcast_to(x[None], (axis_size,) + x.shape))
        s_b, Fx_b, Fy_b, q_b, dts_b, nsub_b = out

        # Lane packing (see ops/packed.py / pressure_solve_vmappable).
        Ny = s.shape[-1]
        P = 128 // Ny if (packed and Ny <= 64 and 128 % Ny == 0) else 1
        block_pairs = 16
        group = (P * block_pairs) if P > 1 else block

        pad = (-axis_size) % group
        if pad:
            idx = jnp.arange(axis_size + pad) % axis_size
            s_b, Fx_b, Fy_b, q_b, dts_b, nsub_b = (
                x[idx] for x in (s_b, Fx_b, Fy_b, q_b, dts_b, nsub_b)
            )
        if P > 1:
            s_out = transport_substeps_pallas_packed(
                s_b, Fx_b, Fy_b, q_b, dts_b, nsub_b, fluid_t, P,
                block_pairs=block_pairs, interpret=interpret,
            )
            return s_out[:axis_size], True
        s_out = transport_substeps_pallas_batched(
            s_b, Fx_b, Fy_b, q_b, dts_b, nsub_b, fluid_t, block=block,
            interpret=interpret,
        )
        return s_out[:axis_size], True

    return run(s, Fx, Fy, q, dts_over_pv, n_sub)
