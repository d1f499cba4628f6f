"""Pallas TPU kernel: fused multigrid-preconditioned CG pressure solve.

The XLA path executes each CG iteration (one stencil matvec + a full V-cycle,
~20 small elementwise passes) as separate HBM-roundtrip ops; at ~100
iterations per time step this dominates the simulator's wall-clock. This
kernel runs the *entire* restarted MG-PCG solve for one member inside VMEM:
the operator hierarchy (face transmissibilities + diagonals per level,
~70 KB at 64x64), the coarse-level dense inverse, and all CG work vectors
are loaded once; the while/fori iteration does pure VPU/MXU work; the
pressure is written once.

The numerics are literally the shared code: `ops.cg.pcg` and
`ops.multigrid.vcycle_apply` called on VMEM-resident values — Pallas traces
the same jnp/lax program into one Mosaic kernel. Batching over members comes
from `vmap` (the member axis becomes a grid dimension).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from historymatching_tpu.ops.cg import pcg, pcg_batched
from historymatching_tpu.ops.multigrid import vcycle_apply
from historymatching_tpu.ops.stencil import stencil_matvec, stencil_residual_ds


@partial(jax.jit, static_argnames=("tol", "maxiter", "restart_every", "nu", "interpret",
                                   "patience_iters", "compensated"))
def pressure_solve_pallas(hier_flat, Ainv, q, p0, tol, maxiter, restart_every=8, nu=2,
                          interpret=False, patience_iters=96, compensated=False):
    """Solve the TPFA pressure system for one member in one fused kernel.

    hier_flat : flat tuple (TX0, TY0, diag0, TX1, ...) — the Galerkin
        hierarchy from `ops.multigrid.build_hierarchy` (per member).
    Ainv : dense inverse of the coarsest operator (`coarse_inverse`) with
        rows unflattened to (n, Nc, Mc) — i.e. Ainv.reshape(n, Nc, Mc) —
        so the kernel's coarse solve needs no runtime reshape.
    q, p0 : RHS and warm-start pressure (Nx, Ny).

    Returns (p, iters, rel_res) with rel_res the achieved true relative
    residual. vmap over a leading member axis for ensembles.
    """
    L = len(hier_flat) // 3
    n_in = len(hier_flat) + 3

    def kernel(*refs):
        ins, (p_out, it_out, rel_out) = refs[:n_in], refs[n_in:]
        vals = [r[:] for r in ins]
        hier = [tuple(vals[3 * lv : 3 * lv + 3]) for lv in range(L)]
        Ainv_v, q_v, p0_v = vals[3 * L], vals[3 * L + 1], vals[3 * L + 2]
        TX0, TY0, diag0 = hier[0]
        matvec = lambda x: stencil_matvec(TX0, TY0, diag0, x)  # noqa: E731
        Minv = lambda b: vcycle_apply(hier, Ainv_v, b, nu=nu, mosaic=True)  # noqa: E731
        # Compensated (double-single) replacement residual. Compiles under
        # Mosaic but measured 7-40x slower per solve (0.18 -> 2.6-7.9 ms at
        # 64x64; even Neumaier-sum-only costs 20x) for a ~1.2x floor gain —
        # default OFF on the TPU hot path. The XLA path keeps it (cheap there).
        rfn = (lambda x: stencil_residual_ds(TX0, TY0, diag0, x, q_v)) if compensated else None
        x, k, rel = pcg(
            matvec, q_v, x0=p0_v, Minv=Minv, tol=tol, maxiter=maxiter,
            restart_every=restart_every, patience_iters=patience_iters,
            residual_fn=rfn,
        )
        p_out[:] = x
        it_out[0, 0] = k
        rel_out[0, 0] = rel

    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in
    out_specs = (
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    )
    p, it, rel = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), q.dtype),
        ),
        interpret=interpret,
    )(*hier_flat, Ainv, q, p0)
    return p, it[0, 0], rel[0, 0]


@partial(
    jax.jit,
    static_argnames=("tol", "maxiter", "restart_every", "nu", "block", "interpret"),
)
def pressure_solve_pallas_batched(hier_flat, Ainv, q, p0, tol, maxiter, restart_every=8,
                                  nu=2, block=8, interpret=False):
    """Batched variant: all inputs carry a leading member axis (N, ...).

    Each Pallas program solves `block` members with the hand-batched
    `pcg_batched` (scalar while-condition; per-member masking) — ops become
    (block, Nx, Ny) sized, which would amortize the VPU small-op overhead
    that dominates per-member programs. Correct in interpreter mode (tested),
    but the Mosaic compiler in this environment CRASHES (SIGABRT) compiling
    it — kept for when the toolchain catches up; production uses the
    per-member kernel. N must be divisible by `block`.
    Returns (p, iters, rel) with leading N.
    """
    N = q.shape[0]
    assert N % block == 0, (N, block)
    L = len(hier_flat) // 3
    n_in = len(hier_flat) + 3

    def kernel(*refs):
        ins, (p_out, it_out, rel_out) = refs[:n_in], refs[n_in:]
        vals = [r[:] for r in ins]  # each (block, ...)
        hier = [tuple(vals[3 * lv : 3 * lv + 3]) for lv in range(L)]
        Ainv_v, q_v, p0_v = vals[3 * L], vals[3 * L + 1], vals[3 * L + 2]
        TX0, TY0, diag0 = hier[0]
        # Hand-batched solver: stencil_matvec / vcycle_apply / pcg_batched all
        # operate on the full (block, Nx, Ny) batch with per-member masking —
        # Mosaic rejects the vector while-condition that jax.vmap(pcg) makes.
        matvec = lambda x: stencil_matvec(TX0, TY0, diag0, x)  # noqa: E731
        Minv = lambda b: vcycle_apply(hier, Ainv_v, b, nu=nu, mosaic=True)  # noqa: E731
        x, k, rel = pcg_batched(matvec, q_v, x0=p0_v, Minv=Minv, tol=tol,
                                maxiter=maxiter, restart_every=restart_every)
        p_out[:] = x
        it_out[0, 0] = k
        rel_out[0, 0] = rel

    def bspec(x):
        return pl.BlockSpec((block,) + x.shape[1:], lambda i: (i,) + (0,) * (x.ndim - 1))

    args = tuple(hier_flat) + (Ainv, q, p0)
    in_specs = [bspec(a) for a in args]
    # Scalar-per-member outputs as (nBlocks, 1, block) VMEM vectors: the
    # block's last two dims equal the array's (Mosaic block-shape rule), and
    # SMEM only accepts true scalar stores.
    out_specs = (
        bspec(q),
        pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0)),
    )
    p, it, rel = pl.pallas_call(
        kernel,
        grid=(N // block,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((N // block, 1, block), jnp.int32),
            jax.ShapeDtypeStruct((N // block, 1, block), q.dtype),
        ),
        interpret=interpret,
    )(*args)
    return p, it.reshape(N), rel.reshape(N)
