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
                                   "patience_iters", "compensated", "smoother"))
def pressure_solve_pallas(hier_flat, Ainv, q, p0, w, tol, maxiter, restart_every=8, nu=2,
                          interpret=False, patience_iters=96, compensated=False,
                          smoother="jacobi"):
    """Solve the TPFA pressure system for one member in one fused kernel.

    hier_flat : flat tuple (TX0, TY0, diag0, TX1, ...) — the Galerkin
        hierarchy from `ops.multigrid.build_hierarchy` (per member).
    Ainv : dense inverse of the coarsest operator (`coarse_inverse`) with
        rows unflattened to (n, Nc, Mc) — i.e. Ainv.reshape(n, Nc, Mc) —
        so the kernel's coarse solve needs no runtime reshape.
    q, p0 : RHS and warm-start pressure (Nx, Ny).
    w : elementwise convergence-metric weight (Nx, Ny) — see
        `ops.cg.pcg(metric_weight=...)`; pass ones for the plain norm.

    Returns (p, iters, rel_res) with rel_res the achieved true relative
    residual. vmap over a leading member axis for ensembles.
    """
    L = len(hier_flat) // 3
    n_in = len(hier_flat) + 4

    def pressure_pcg_kernel(*refs):
        ins, (p_out, it_out, rel_out) = refs[:n_in], refs[n_in:]
        vals = [r[:] for r in ins]
        hier = [tuple(vals[3 * lv : 3 * lv + 3]) for lv in range(L)]
        Ainv_v, q_v, p0_v, w_v = vals[3 * L], vals[3 * L + 1], vals[3 * L + 2], vals[3 * L + 3]
        TX0, TY0, diag0 = hier[0]
        matvec = lambda x: stencil_matvec(TX0, TY0, diag0, x)  # noqa: E731
        Minv = lambda b: vcycle_apply(hier, Ainv_v, b, nu=nu, mosaic=True, smoother=smoother)  # noqa: E731
        # Compensated (double-single) replacement residual. Compiles under
        # Mosaic but measured 7-40x slower per solve (0.18 -> 2.6-7.9 ms at
        # 64x64; even Neumaier-sum-only costs 20x) for a ~1.2x floor gain —
        # default OFF on the TPU hot path. The XLA path keeps it (cheap there).
        rfn = (lambda x: stencil_residual_ds(TX0, TY0, diag0, x, q_v)) if compensated else None
        x, k, rel = pcg(
            matvec, q_v, x0=p0_v, Minv=Minv, tol=tol, maxiter=maxiter,
            restart_every=restart_every, patience_iters=patience_iters,
            residual_fn=rfn, metric_weight=w_v,
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
        pressure_pcg_kernel,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), q.dtype),
        ),
        interpret=interpret,
    )(*hier_flat, Ainv, q, p0, w)
    return p, it[0, 0], rel[0, 0]


@partial(
    jax.jit,
    static_argnames=("tol", "maxiter", "restart_every", "nu", "block", "interpret",
                     "patience_iters", "smoother"),
)
def pressure_solve_pallas_batched(hier_flat, Ainv, q, p0, w, tol, maxiter, restart_every=8,
                                  nu=2, block=8, interpret=False, patience_iters=96,
                                  smoother="jacobi"):
    """Batched variant: all inputs carry a leading member axis (N, ...).

    Each Pallas program solves `block` members with the hand-batched
    `pcg_batched` (scalar while-condition; per-member masking) — ops become
    (block, Nx, Ny) sized, amortizing the small-op overhead that dominates
    per-member programs (measured ~1.4x faster than vmap of the per-member
    kernel on N=32 64x64 cold solves; equal-or-better accuracy). block=8 is
    the measured sweet spot: 16/32 compile with the raised vmem limit but
    run 7-20% slower (more VMEM pressure, no extra per-op parallelism).
    See `pcg_batched` for the Mosaic layout rules this obeys.
    N must be divisible by `block`. Returns (p, iters, rel) with leading N.
    """
    N = q.shape[0]
    assert N % block == 0, (N, block)
    L = len(hier_flat) // 3
    n_in = len(hier_flat) + 4

    def pressure_pcg_batched_kernel(*refs):
        ins, (p_out, it_out, rel_out) = refs[:n_in], refs[n_in:]
        vals = [r[:] for r in ins]  # each (block, ...)
        hier = [tuple(vals[3 * lv : 3 * lv + 3]) for lv in range(L)]
        Ainv_v, q_v, p0_v, w_v = vals[3 * L], vals[3 * L + 1], vals[3 * L + 2], vals[3 * L + 3]
        TX0, TY0, diag0 = hier[0]
        # Hand-batched solver: stencil_matvec / vcycle_apply / pcg_batched all
        # operate on the full (block, Nx, Ny) batch with per-member masking —
        # Mosaic rejects the vector while-condition that jax.vmap(pcg) makes.
        matvec = lambda x: stencil_matvec(TX0, TY0, diag0, x)  # noqa: E731
        Minv = lambda b: vcycle_apply(hier, Ainv_v, b, nu=nu, mosaic=True, smoother=smoother)  # noqa: E731
        x, k, rel = pcg_batched(matvec, q_v, x0=p0_v, Minv=Minv, tol=tol,
                                maxiter=maxiter, restart_every=restart_every,
                                patience_iters=patience_iters, metric_weight=w_v)
        p_out[:] = x
        # rank-3 stores only: rank-1 vectors / reshapes abort Mosaic's
        # vector-layout inference (layout.h arr.size() >= layout_rank).
        it_out[:] = (rel * 0).astype(jnp.int32) + k
        rel_out[:] = rel

    def bspec(x):
        return pl.BlockSpec((block,) + x.shape[1:], lambda i: (i,) + (0,) * (x.ndim - 1))

    args = tuple(hier_flat) + (Ainv, q, p0, w)
    in_specs = [bspec(a) for a in args]
    # Scalar-per-member outputs as (N, 1, 1) VMEM arrays (block (block, 1, 1))
    # — matches pcg_batched's keepdims shapes with zero in-kernel reshapes.
    out_specs = (
        bspec(q),
        pl.BlockSpec((block, 1, 1), lambda i: (i, 0, 0)),
        pl.BlockSpec((block, 1, 1), lambda i: (i, 0, 0)),
    )
    p, it, rel = pl.pallas_call(
        pressure_pcg_batched_kernel,
        grid=(N // block,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((N, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((N, 1, 1), q.dtype),
        ),
        # v5e has 128 MB VMEM; the default 16 MB scoped limit rejects
        # block>=16 (16.18 MB). Raised so larger blocks stay explorable,
        # though block=8 measures fastest.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return p, it.reshape(N), rel.reshape(N)


@partial(
    jax.jit,
    static_argnames=("P", "tol", "maxiter", "restart_every", "nu", "block_pairs",
                     "interpret", "patience_iters", "smoother"),
)
def pressure_solve_pallas_packed(hier_flat_p, Ainv3p, qp, p0p, wp, P, tol, maxiter,
                                 restart_every=8, nu=2, block_pairs=4,
                                 interpret=False, patience_iters=96,
                                 smoother="jacobi"):
    """Lane-packed batched pressure solve: P members share each lane row
    (ops/packed.py), so at Ny = 64 every VPU op uses all 128 lanes instead
    of half. Inputs are packed full-width levels ((G, Nx, P*Ny) face/diag
    triples), the grouped coarse inverse (multigrid.pack_coarse_inv), and
    packed q/p0/w; G = N/P pair-rows, `block_pairs` pair-rows per program.

    Returns (p_packed, iters (G,1,W) int, rel (G,1,W)) — per-member rel
    values live blockwise on the lane axis (extract [..., ::Ny])."""
    from historymatching_tpu.ops.multigrid import vcycle_apply_packed
    from historymatching_tpu.ops.packed import stencil_matvec_packed

    G = qp.shape[0]
    W = qp.shape[-1]
    assert G % block_pairs == 0, (G, block_pairs)
    L = len(hier_flat_p) // 3
    n_in = len(hier_flat_p) + 4

    def pressure_pcg_packed_kernel(*refs):
        ins, (p_out, it_out, rel_out) = refs[:n_in], refs[n_in:]
        vals = [r[:] for r in ins]
        hier = [tuple(vals[3 * lv: 3 * lv + 3]) for lv in range(L)]
        Ainv_v, q_v, p0_v, w_v = vals[3 * L], vals[3 * L + 1], vals[3 * L + 2], vals[3 * L + 3]
        TXf, TYf, diag0 = hier[0]
        matvec = lambda x: stencil_matvec_packed(TXf, TYf, diag0, x)  # noqa: E731
        Minv = lambda b: vcycle_apply_packed(hier, Ainv_v, b, P, nu=nu, smoother=smoother)  # noqa: E731
        x, k, rel = pcg_batched(matvec, q_v, x0=p0_v, Minv=Minv, tol=tol,
                                maxiter=maxiter, restart_every=restart_every,
                                patience_iters=patience_iters, metric_weight=w_v,
                                group_lanes=P)
        p_out[:] = x
        it_out[:] = (rel * 0).astype(jnp.int32) + k
        rel_out[:] = rel

    def bspec(x):
        return pl.BlockSpec((block_pairs,) + x.shape[1:],
                            lambda i: (i,) + (0,) * (x.ndim - 1))

    args = tuple(hier_flat_p) + (Ainv3p, qp, p0p, wp)
    in_specs = [bspec(a) for a in args]
    out_specs = (
        bspec(qp),
        pl.BlockSpec((block_pairs, 1, W), lambda i: (i, 0, 0)),
        pl.BlockSpec((block_pairs, 1, W), lambda i: (i, 0, 0)),
    )
    p, it, rel = pl.pallas_call(
        pressure_pcg_packed_kernel,
        grid=(G // block_pairs,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct(qp.shape, qp.dtype),
            jax.ShapeDtypeStruct((G, 1, W), jnp.int32),
            jax.ShapeDtypeStruct((G, 1, W), qp.dtype),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return p, it, rel


def _pack_args(hier_flat, Ainv, q, p0, w, P):
    """Batched (N, ...) kernel operands -> lane-packed (N/P, ...) operands.
    XLA-land (outside the kernel); hier_flat leaves cycle (TX, TY, diag)."""
    from historymatching_tpu.ops.multigrid import pack_coarse_inv
    from historymatching_tpu.ops.packed import pack_cells, pack_faces_x, pack_faces_y

    packed = []
    for lv in range(len(hier_flat) // 3):
        TX, TY, diag = hier_flat[3 * lv: 3 * lv + 3]
        packed += [pack_faces_x(TX, P), pack_faces_y(TY, P), pack_cells(diag, P)]
    return (tuple(packed), pack_coarse_inv(Ainv, P), pack_cells(q, P),
            pack_cells(p0, P), pack_cells(w, P))


def pressure_solve_vmappable(hier_flat, Ainv, q, p0, w, *, tol, maxiter, restart_every=8,
                             nu=2, patience_iters=96, compensated=False, block=8,
                             packed=True, two_pass=True, twopass_j1=64,
                             twopass_div=4, refine=True, interpret=False,
                             smoother="jacobi"):
    """Per-member pressure solve whose `vmap` rule is the blocked kernel.

    Unbatched calls run the per-member fused kernel; under `jax.vmap` (the
    ensemble axis in `forward_model` -> `vmap(simulate)`) the custom batching
    rule pads the member axis to a multiple of `block` and dispatches
    `pressure_solve_pallas_batched` — so the whole simulator keeps its
    clean per-member formulation while the hot solve runs block-batched.

    The batched-path strategy knobs are explicit (static) kwargs — NOT env
    vars: the rule runs at trace time of the enclosing jit, so env reads
    would be silently frozen into the compiled program per shape (round-2
    ADVICE). They thread from `simulate(...)`:
      packed      : lane-pack P = 128//Ny members per lane row when it fits.
      two_pass    : straggler recook (short pass 1, re-solve the worst
                    1/twopass_div of members warm-started with the full
                    budget). Engages only when >= 2 Mosaic programs.
      twopass_j1  : pass-1 iteration cap.
      refine      : pass-3 iterative refinement of the recooked members with
                    a compensated (double-single) replacement residual.
    """

    @jax.custom_batching.custom_vmap
    def solve(hier_flat, Ainv, q, p0, w):
        return pressure_solve_pallas(
            hier_flat, Ainv, q, p0, w, tol, maxiter, restart_every=restart_every,
            nu=nu, patience_iters=patience_iters, compensated=compensated,
            interpret=interpret, smoother=smoother,
        )

    @solve.def_vmap
    def _rule(axis_size, in_batched, hier_flat, Ainv, q, p0, w):
        def ensure(x, batched):
            return x if batched else jnp.broadcast_to(x[None], (axis_size,) + x.shape)

        hb, ab, qb, pb, wb = in_batched
        hier_flat_b = tuple(ensure(h, hbi) for h, hbi in zip(hier_flat, hb))
        Ainv_b = ensure(Ainv, ab)
        q_b = ensure(q, qb)
        p0_b = ensure(p0, pb)
        w_b = ensure(w, wb)

        # Lane packing factor: P members per 128-lane row (ops/packed.py) —
        # at the flagship Ny = 64 the unpacked kernels waste half the lanes.
        Ny = q.shape[-1]
        P = 128 // Ny if (packed and Ny <= 64 and 128 % Ny == 0) else 1

        # Packed sweet spot (measured, N=128 x 256 fixed iters, 64x64):
        # blocked block=8: 80 ms; packed 8/16/32 members-per-program:
        # 50/44/41 ms — the full-lane layout is ~2x, biggest programs best.
        block_pairs = 16
        group = (P * block_pairs) if P > 1 else block  # padding granularity
        pad = (-axis_size) % group
        if pad:
            # modular gather, not x[:pad] — slicing clamps when pad > N
            idx = jnp.arange(axis_size + pad) % axis_size
            grow = lambda x: x[idx]  # noqa: E731
            hier_flat_b = tuple(grow(h) for h in hier_flat_b)
            Ainv_b, q_b, p0_b, w_b = grow(Ainv_b), grow(q_b), grow(p0_b), grow(w_b)

        if P > 1:
            from historymatching_tpu.ops.packed import unpack_cells

            def packed_solve(hier_f, Ainv_, q_, p0_, w_, miter):
                hier_p, Ainv_p, q_p, p0_p, w_p = _pack_args(
                    hier_f, Ainv_, q_, p0_, w_, P
                )
                pp, it_p, rel_p = pressure_solve_pallas_packed(
                    hier_p, Ainv_p, q_p, p0_p, w_p, P, tol, miter,
                    restart_every=restart_every, nu=nu, block_pairs=block_pairs,
                    patience_iters=patience_iters, interpret=interpret,
                    smoother=smoother,
                )
                return (unpack_cells(pp, P),
                        it_p[:, 0, ::Ny].reshape(-1),
                        rel_p[:, 0, ::Ny].reshape(-1))

            Nb = q_b.shape[0]
            # Straggler recook: a program runs to its SLOWEST member's
            # iteration count, and hard members are rare — so give everyone
            # a short pass 1, then gather the worst-K members (by achieved
            # physical residual: an exact difficulty signal) into a few
            # dense programs and finish them warm-started. CG restarted
            # from the pass-1 iterate with residual replacement is the
            # same algorithm, so converged members are bit-unaffected and
            # stragglers get at least the old budget. Measured: most
            # members need < 64 iters/solve while program maxes ran ~246.
            J1 = twopass_j1
            frac = twopass_div  # 1/frac of members recooked
            # Engage whenever there are at least two programs — small batches
            # gain little, but the quality-parity harness (N=192) must
            # exercise the SAME code path the flagship bench runs.
            engage = two_pass and maxiter > J1 and Nb >= 2 * group
            if not engage:
                p, it, rel = packed_solve(hier_flat_b, Ainv_b, q_b, p0_b, w_b,
                                          maxiter)
                return ((p[:axis_size], it[:axis_size], rel[:axis_size]),
                        (True, True, True))

            p1, it1, rel1 = packed_solve(hier_flat_b, Ainv_b, q_b, p0_b, w_b, J1)
            K = max(group, (Nb // frac // group) * group)
            _, idx = jax.lax.top_k(rel1, K)
            take = lambda x: x[idx]  # noqa: E731
            hier_k = tuple(take(h) for h in hier_flat_b)
            Ainv_k, q_k, w_k = take(Ainv_b), take(q_b), take(w_b)
            p2, it2, rel2 = packed_solve(hier_k, Ainv_k, q_k, take(p1), w_k,
                                         maxiter)

            if refine:
                # Pass 3 — iterative refinement for the same stragglers: the
                # f32 floor is the *measurement* noise of r = q - A x, so
                # compute the replacement residual ONCE with compensated
                # (double-single) arithmetic in XLA-land (cheap there; it was
                # 7-40x too slow inside Mosaic) and solve the correction.
                from historymatching_tpu.ops.stencil import stencil_residual_ds

                TXk, TYk, diagk = hier_k[0], hier_k[1], hier_k[2]
                r_ds = stencil_residual_ds(TXk, TYk, diagk, p2, q_k)
                d3, it3, rel3 = packed_solve(
                    hier_k, Ainv_k, r_ds, jnp.zeros_like(r_ds), w_k, 96
                )
                p2 = p2 + d3
                it2 = it2 + it3
                # rel3 is relative to ||w r_ds||; rescaled by ||w r_ds||/||w q||
                # it IS the residual of the refined iterate p2 + d3 (up to
                # f32 in the correction solve). Report it alone — taking
                # min() with the stale pre-refinement rel2 could flatter the
                # `accepted`/cg_ok flags when the correction solve stalls.
                num = jnp.linalg.norm((w_k * r_ds).reshape(K, -1), axis=1)
                den = jnp.maximum(
                    jnp.linalg.norm((w_k * q_k).reshape(K, -1), axis=1),
                    jnp.finfo(q_k.dtype).tiny,
                )
                rel2 = rel3 * num / den

            p = p1.at[idx].set(p2)
            it = it1.at[idx].add(it2)
            rel = rel1.at[idx].set(rel2)
            return (p[:axis_size], it[:axis_size], rel[:axis_size]), (True, True, True)

        p, it, rel = pressure_solve_pallas_batched(
            hier_flat_b, Ainv_b, q_b, p0_b, w_b, tol, maxiter,
            restart_every=restart_every, nu=nu, block=block,
            patience_iters=patience_iters, smoother=smoother,
        )
        return (p[:axis_size], it[:axis_size], rel[:axis_size]), (True, True, True)

    return solve(hier_flat, Ainv, q, p0, w)
