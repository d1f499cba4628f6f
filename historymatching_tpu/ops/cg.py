"""Batched matrix-free preconditioned conjugate gradients.

Replaces the reference simulator's sparse direct solve (scipy spsolve,
SURVEY.md S1.8) with an iterative SPD solver designed for TPU batching:

- matrix-free `matvec` closure (the 5-point stencil) — no sparse formats;
- Jacobi (diagonal) preconditioning;
- *restarted* PCG with periodic residual replacement: in float32 the CG
  recurrence residual drifts from the true residual on high-contrast
  permeability fields (measured: recurred "convergence" at a true relative
  residual of ~1e-2). Every `restart_every` iterations the true residual
  r = b - A x is recomputed and convergence is judged against it; if not
  converged, CG restarts from the current iterate. This bounds the drift
  window and makes float32 solves trustworthy;
- `lax.while_loop` outer + masked `fori_loop` inner — static shapes, dynamic
  trip counts; under `vmap` converged members are masked (XLA batching),
  so divergent per-member iteration counts need no ragged shapes;
- warm starting from the previous time step's pressure (the mobility field
  changes slowly, typically cutting iterations by a large factor).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _vdot(a, b):
    return jnp.sum(a * b)


def pcg(matvec, b, x0=None, Minv=None, tol=1e-8, maxiter=1000, restart_every=64,
        patience_iters=96, residual_fn=None, metric_weight=None):
    """Solve A x = b for SPD A via restarted preconditioned CG.

    Parameters
    ----------
    matvec : callable x -> A @ x.
    b : right-hand side.
    x0 : initial guess (zeros if None).
    Minv : elementwise inverse-preconditioner (e.g. 1/diag); identity if None.
    tol : relative tolerance on the *true* residual, ||b - A x|| <= tol ||b||.
    maxiter : hard cap on total CG iterations (static).
    restart_every : residual-replacement window (static).
    metric_weight : optional elementwise weight w — convergence/stagnation/
        best-iterate tracking use ||w * r|| instead of ||r|| (and the
        tolerance is relative to ||w * b||). The CG direction algebra is
        untouched. Used by the symmetrically-scaled pressure solve to iterate
        on the well-conditioned scaled system while stopping on the
        *physical* (unscaled) flux-imbalance norm: w = sqrt(diag(A_orig)).

    Returns (x, iters, rel_res) — `rel_res` is the achieved true relative
    residual ||w (b - A x)|| / ||w b|| of the best iterate; callers judge
    convergence/validity against their own threshold (float32 has an
    accuracy floor set by the operator's contrast).

    The loop also exits on *stagnation*: if a whole window reduces the best
    residual by less than 2%, more iterations cannot help (f32 floor).
    """
    dtype = b.dtype
    x0 = jnp.zeros_like(b) if x0 is None else x0
    if Minv is None:
        Minv_ = lambda r: r
    elif callable(Minv):
        Minv_ = Minv  # e.g. a multigrid V-cycle (must be a fixed SPD operator)
    else:
        Minv_ = lambda r: Minv * r
    if metric_weight is None:
        wdot = _vdot
    else:
        wdot = lambda u, v: _vdot(metric_weight * u, metric_weight * v)

    bb = wdot(b, b)
    # Guard an all-zero RHS (legal: zero rates).
    tol2 = (tol * tol) * jnp.maximum(bb, jnp.finfo(dtype).tiny)

    resid = (lambda x: b - matvec(x)) if residual_fn is None else residual_fn

    r0 = resid(x0)
    # Inherit the system's varying-manual-axes type (shard_map): a replicated
    # initial guess / RHS must not differ in vma from the loop outputs, which
    # pick up "varying" from the (member-sharded) operator coefficients.
    x0 = x0 + jnp.zeros_like(r0)

    def cg_steps(x, r, p, rz, beta_mask):
        """`restart_every` PCG steps (live-masked once converged).

        `beta_mask` = 1 gives classic PCG; 0 zeroes the direction memory,
        i.e. preconditioned steepest descent — monotone in the A-norm, the
        safe fallback after an f32 CG blowup. A scalar multiply instead of
        `lax.cond` keeps the graph branch-free (batched cond is not
        supported by every TPU backend, and both modes share this body).
        """

        def body(_, st):
            x, r, p, rz, rr = st
            live = rr > tol2
            Ap = matvec(p)
            pAp = _vdot(p, Ap)
            alpha = jnp.where(live, rz / jnp.where(pAp == 0, 1.0, pAp), 0.0)
            x = x + alpha * p
            r = r - alpha * Ap
            z = Minv_(r)
            rz_new = jnp.where(live, _vdot(r, z), rz)
            beta = jnp.where(live, beta_mask * rz_new / jnp.where(rz == 0, 1.0, rz), 0.0)
            p = jnp.where(live, z + beta * p, p)
            return (x, r, p, rz_new, jnp.where(live, wdot(r, r), rr))

        st = (x, r, p, rz, wdot(r, r))
        st = lax.fori_loop(0, restart_every, body, st)
        return st[0], st[2]  # x, p

    # Stagnation patience, in iterations: CG's residual 2-norm is non-monotone
    # (a single non-improving window is normal), but members pinned at their
    # float32 accuracy floor must not grind the whole `maxiter` budget every
    # solve — under vmap the batch pays the max.
    patience = max(4, -(-patience_iters // restart_every))

    def cond(state):
        x, p, reset, x_best, rr_best, n_bad, k = state
        return (k < maxiter) & (rr_best > tol2) & (n_bad < patience)

    def body(state):
        x, p, use_sd, x_best, rr_best, n_bad, k = state
        # Residual replacement: refresh r with the *true* residual but keep
        # the search direction p — preserves the CG convergence rate while
        # resetting the f32 drift between recurred and true residuals.
        r = resid(x)
        z = Minv_(r)
        beta_mask = jnp.where(use_sd, 0.0, 1.0).astype(b.dtype)
        p_start = jnp.where(use_sd, z, p)
        x_new, p_new = cg_steps(x, r, p_start, _vdot(r, z), beta_mask)
        r_new = resid(x_new)
        rr_new = wdot(r_new, r_new)
        # Divergence guard only — the residual 2-norm is NOT monotone in CG,
        # so moderate growth is legitimate; a >100x jump (or non-finite) means
        # f32 drift destroyed the direction. Revert to the best iterate and
        # run a steepest-descent window next: retrying CG from the same state
        # is deterministic and would blow up identically forever.
        finite = jnp.isfinite(rr_new)
        blown = (~finite) | (rr_new > 100.0 * jnp.maximum(rr_best, tol2))
        better = finite & (rr_new < rr_best)
        x_best = jnp.where(better, x_new, x_best)
        rr_best = jnp.where(better, rr_new, rr_best)
        x = jnp.where(blown, x_best, x_new)
        n_bad = jnp.where(better, 0, n_bad + 1)
        return (x, p_new, blown, x_best, rr_best, n_bad, k + restart_every)

    rr0 = wdot(r0, r0)
    # Flags/counters must share the system's varying-manual-axes type too.
    vfalse = rr0 != rr0  # False, with rr0's vma
    vzero = (rr0 * 0).astype(jnp.int32)
    state0 = (x0, Minv_(r0), vfalse, x0, rr0, vzero, vzero)
    # (state: x, p, use_sd, x_best, rr_best, n_bad, k)
    _, _, _, x_best, rr_best, _, k = lax.while_loop(cond, body, state0)
    rel_res = jnp.sqrt(rr_best / jnp.maximum(bb, jnp.finfo(dtype).tiny))
    return x_best, k, rel_res


def pcg_batched(matvec, b, x0=None, Minv=None, tol=1e-8, maxiter=1000, restart_every=8,
                patience_iters=96, residual_fn=None, metric_weight=None,
                group_lanes=1):
    """Hand-batched restarted PCG: `b`, `x0` are (B, ...) member batches.

    Same algorithm as `pcg` with per-member masking, but with a *scalar*
    while-condition (all members done) — required inside Pallas kernels,
    where Mosaic rejects the vector conditions `jax.vmap(pcg)` produces.
    `matvec`/`Minv` must accept the full (B, ...) batch.
    Returns (x, iters scalar, rel_res (B, 1, ..., 1)); callers squeeze
    rel_res outside the kernel (in-kernel rank-1 reshapes abort Mosaic).

    Mosaic layout discipline (each rule is a measured compiler failure):
    - per-member scalars are carried BROADCAST TO FULL FIELD SHAPE
      (B, Nx, Ny). Rank-1 (B,) vectors abort layout inference
      (`layout.h: arr.size() >= layout_rank`); keepdims (B, 1, 1) scalars
      are ruled out twice over — reductions produce the lane-replicated
      layout {*,*} while loop-body results are concrete {0,0}, and carrying
      the mix through `scf.while` fails to legalize ("failed to legalize
      scf.yield"), while re-broadcasting a concrete (B, 1, 1) to the field
      is "Not implemented: Broadcast in both sublanes and lanes". Full-size
      carries are always concrete, and the broadcast happens right after
      the reduction while the value is still replicated (free).
    - reductions go ONE AXIS AT A TIME, last to first: a multi-axis
      `jnp.sum(axis=(1,2), keepdims=True)` lowers through a rank-1
      `vector<Bxf32>`.
    - the while-condition reduces axis 0 first (rank-3 -> rank-2), then a
      full rank-2 reduce to a true scalar — `jnp.any` and full rank-3
      reductions both lower via `vector<1xf32>`.
    """
    dtype = b.dtype
    B = b.shape[0]
    x0 = jnp.zeros_like(b) if x0 is None else x0
    Minv_ = (lambda r: r) if Minv is None else Minv

    if group_lanes > 1:
        # Lane-packed layout: `group_lanes` members share each lane row
        # (ops/packed.py); per-member scalars become per-lane-block fields.
        # All masking/guard logic below is elementwise on full-size fields,
        # so it turns per-member automatically.
        from historymatching_tpu.ops.packed import grouped_vdot

        def vdot(u, v):
            return grouped_vdot(u, v, group_lanes)
    else:
        def vdot(u, v):
            """Per-member dot, broadcast back to the full field shape (B, ...).

            The intermediate never drops below rank 2, and the broadcast
            happens while the reduced value still has Mosaic's replicated
            layout."""
            s = u * v
            for ax in range(s.ndim - 1, 0, -1):
                s = jnp.sum(s, axis=ax, keepdims=True)
            return jnp.broadcast_to(s, b.shape)

    if metric_weight is None:
        wdot = vdot
    else:
        wdot = lambda u, v: vdot(metric_weight * u, metric_weight * v)  # noqa: E731

    def scalarize(field_bool):
        """Any-member-true over a full-size boolean field -> true scalar."""
        f = jnp.where(field_bool, 1.0, 0.0).astype(dtype)
        f2 = jnp.sum(f, axis=0)  # rank-3 -> rank-2 (never rank-1)
        return jnp.sum(f2) > 0

    bb = wdot(b, b)
    tol2 = (tol * tol) * jnp.maximum(bb, jnp.finfo(dtype).tiny)
    resid = (lambda x: b - matvec(x)) if residual_fn is None else residual_fn

    r0 = resid(x0)
    x0 = x0 + jnp.zeros_like(r0)
    patience = max(4, -(-patience_iters // restart_every))

    def cg_steps(x, r, p, rz, beta_mask):
        def body(_, st):
            x, r, p, rz, rr = st
            live = rr > tol2  # (B, ...) full-size mask
            Ap = matvec(p)
            pAp = vdot(p, Ap)
            alpha = jnp.where(live, rz / jnp.where(pAp == 0, 1.0, pAp), 0.0)
            x = x + alpha * p
            r = r - alpha * Ap
            z = Minv_(r)
            rz_new = jnp.where(live, vdot(r, z), rz)
            beta = jnp.where(live, beta_mask * rz_new / jnp.where(rz == 0, 1.0, rz), 0.0)
            p = jnp.where(live, z + beta * p, p)
            return (x, r, p, rz_new, jnp.where(live, wdot(r, r), rr))

        st = (x, r, p, rz, wdot(r, r))
        st = lax.fori_loop(0, restart_every, body, st)
        return st[0], st[2]

    def cond(state):
        x, p, use_sd, x_best, rr_best, n_bad, k = state
        active = (rr_best > tol2) & (n_bad < patience)
        return (k < maxiter) & scalarize(active)

    def body(state):
        # use_sd is a 0/1 float field, NOT a bool: carrying i1 vectors
        # through scf.while trips Mosaic's "Expected mask vector types"
        # (tpu.mask_cast on the packed mask layout).
        x, p, use_sd, x_best, rr_best, n_bad, k = state
        r = resid(x)
        z = Minv_(r)
        sd = use_sd > 0.5
        beta_mask = 1.0 - use_sd
        p_start = jnp.where(sd, z, p)
        x_new, p_new = cg_steps(x, r, p_start, vdot(r, z), beta_mask)
        r_new = resid(x_new)
        rr_new = wdot(r_new, r_new)
        finite = jnp.isfinite(rr_new)
        blown = (~finite) | (rr_new > 100.0 * jnp.maximum(rr_best, tol2))
        better = finite & (rr_new < rr_best)
        x_best = jnp.where(better, x_new, x_best)
        rr_best = jnp.where(better, rr_new, rr_best)
        x = jnp.where(blown, x_best, x_new)
        n_bad = jnp.where(better, 0, n_bad + 1)
        blown_f = jnp.where(blown, 1.0, 0.0).astype(dtype)
        return (x, p_new, blown_f, x_best, rr_best, n_bad, k + restart_every)

    rr0 = wdot(r0, r0)
    state0 = (
        x0,
        Minv_(r0),
        rr0 * 0,  # use_sd = all-zero float field (see body)
        x0,
        rr0,
        (rr0 * 0).astype(jnp.int32),
        jnp.array(0, jnp.int32),
    )
    _, _, _, x_best, rr_best, _, k = lax.while_loop(cond, body, state0)
    rel_full = jnp.sqrt(rr_best / jnp.maximum(bb, jnp.finfo(dtype).tiny))
    if group_lanes > 1:
        # Per-member values live blockwise along the lane axis: keep it.
        rel_res = rel_full[(slice(None),) + (slice(0, 1),) * (b.ndim - 2) + (slice(None),)]
    else:
        # Per-member value lives constant across the field; one slice suffices.
        rel_res = rel_full[(slice(None),) + (slice(0, 1),) * (b.ndim - 1)]
    return x_best, k, rel_res
