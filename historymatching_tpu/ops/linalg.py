"""Custom-call-free dense linear algebra (pure matmuls — MXU only).

Why this module exists: the TPU backend in this environment implements no
LAPACK custom calls (cholesky/LU/eigh/SVD all raise UNIMPLEMENTED) and no
FFT. Beyond that constraint, iteration-by-matmul is the genuinely TPU-native
formulation: every routine below is a short fixed/loop sequence of GEMMs
that lives on the MXU, batches trivially under vmap, and has no host
round-trips.

- `spd_inverse` / `spd_solve`: Newton-Schulz iteration
      X_{k+1} = X_k (2 I - A X_k)
  with the safe SPD initialization X_0 = I / upper_bound(lambda_max)
  (Gershgorin row sums). Quadratic convergence once ||I - A X|| < 1; the
  iteration count covers condition numbers up to ~1e8 at float32 accuracy.
  Inputs are symmetrically diagonal-scaled first, which both tightens the
  spectrum and makes the iteration contrast-robust.
- `pinv` (Ben-Israel & Cohen): the same iteration started at
  X_0 = A' / (||A||_1 ||A||_inf) converges to the Moore-Penrose
  pseudo-inverse for any (possibly rank-deficient, non-square) A.
- `sigma_max`: power iteration on A A' for the spectral norm (used to make
  regularization parameters relative, as the reference's rinv does).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _full_precision(fn):
    """Run `fn` with float32-accurate matmuls.

    TPU MXU defaults to bfloat16 inputs for f32 matmuls; the Newton-Schulz
    iterations here need the quadratic-convergence regime, which 8 mantissa
    bits destroy (measured: ES-MDA posterior stops improving on TPU while
    bit-identical code improves on CPU)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped


def _sym(A):
    return 0.5 * (A + A.T)


@_full_precision
def spd_inverse(A, iters=50, jitter=0.0, x0=None):
    """Inverse of an SPD matrix by diagonally-scaled Newton-Schulz.

    Guarded: at float32 with cond(A_scaled) ~> 1/sqrt(eps) the quadratic
    iteration first converges to its rounding floor and then DIVERGES to NaN
    (measured on 16x16 TPFA coarse operators at permeability contrast 4e5:
    residual 0.25 at iteration 10, inf by 25). The loop tracks
    ||A_s X - I||_max and keeps the best iterate, and exits on residual
    GROWTH (divergence), STAGNATION (3 windows without improvement — once
    the quadratic phase bottoms out at the rounding floor, further GEMMs
    change nothing; the cold start's pre-asymptotic phase improves strictly
    every step, so patience 3 never cuts it short), or FLOOR (residual at
    ~machine precision). So extreme inputs yield the best f32-achievable
    (approximate) inverse instead of NaN, and easy inputs stop early.

    `x0` (optional): an approximation of A^{-1} to warm-start from — e.g.
    the previous time step's inverse of a slowly-drifting operator
    (`simulate(coarse_warm=True)`): NS converges quadratically from any
    X0 with ||I - A X0|| < 1, so a close x0 needs 1-3 refresh iterations
    instead of the cold ~log2(cond) ramp. Accepted only when its measured
    residual is < 0.5 (else the cold start is used — a bad guess must not
    poison the guard's best-iterate tracking).

    The per-iteration residual reuses the iteration's own A @ X product
    (carried across the loop), so each step costs 2 GEMMs, not 3."""
    A = jnp.asarray(A)
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)
    d = jnp.diagonal(A)
    s = lax.rsqrt(jnp.maximum(d, jnp.finfo(A.dtype).tiny))
    As = _sym(A * s[:, None] * s[None, :])
    if jitter:
        As = As + jitter * eye
    # lambda_max upper bound (Gershgorin): max row sum of |As|
    lam = jnp.max(jnp.sum(jnp.abs(As), axis=1))
    X = eye / lam
    if x0 is not None:
        # x0 approximates the FULL-space inverse; the iteration runs in the
        # scaled space (A_full^{-1} = S X S with S = diag(s)), so undo.
        si = 1.0 / s
        Xw = _sym(jnp.asarray(x0) * si[:, None] * si[None, :])
        rw = jnp.max(jnp.abs(As @ Xw - eye))
        X = jnp.where(rw < 0.5, Xw, X)

    def resid_of(AX):
        return jnp.max(jnp.abs(AX - eye))

    AX = As @ X
    r0 = resid_of(AX)
    floor = 32 * jnp.finfo(A.dtype).eps
    # n_flat inherits the data's varying-manual-axes type (shard_map): a
    # replicated 0 would not match the loop body's operator-derived output.
    n_flat0 = (r0 * 0).astype(jnp.int32)
    # state: X, AX, best_X, best_res, cur_res, n_flat, k
    state = (X, AX, X, r0, r0, n_flat0, 0)

    def cond(st):
        _, _, _, best, cur, n_flat, k = st
        return (k < iters) & (cur <= 4.0 * best) & (n_flat < 3) & (best > floor)

    def body(st):
        X, AX, bX, best, _, n_flat, k = st
        X = _sym(X @ (2.0 * eye - AX))
        AX = As @ X
        r = resid_of(AX)
        better = r < best
        bX = jnp.where(better, X, bX)
        best = jnp.where(better, r, best)
        n_flat = jnp.where(better, 0, n_flat + 1)
        return (X, AX, bX, best, r, n_flat, k + 1)

    _, _, X, _, _, _, _ = lax.while_loop(cond, body, state)
    return X * s[:, None] * s[None, :]


def spd_solve(A, B, iters=50, jitter=0.0):
    """Solve A X = B for SPD A (Newton-Schulz inverse then one GEMM)."""
    return spd_inverse(A, iters=iters, jitter=jitter) @ B


@_full_precision
def pinv(A, iters=24):
    """Moore-Penrose pseudo-inverse via the Ben-Israel-Cohen iteration.

    X_0 = A' / b with the certain bound b = min(||A||_1 ||A||_inf, ||A||_F^2)
    >= sigma_max^2 guarantees convergence (on the range space, so
    rank-deficient A is covered); the Frobenius bound keeps the initial
    contraction ~1/rank instead of ~1/(m n). ~`iters` GEMM pairs.
    Replaces jnp.linalg.pinv (SVD custom call) on TPU.

    `iters` is capped low on purpose: rounding noise outside range(A')
    DOUBLES every iteration (x -> x(2I - Ax) acts as x -> 2x there), so at
    float32 eps ~1e-7 fifty iterations overflow for ill-conditioned A
    (measured: IES's pinv(W) NaN'd at the reference configuration after a
    few outer GN steps). 24 iterations bound the amplification at ~2^24 eps
    while well-conditioned inputs converge in ~15.
    """
    A = jnp.asarray(A)
    m = A.shape[-2]
    norm1 = jnp.max(jnp.sum(jnp.abs(A), axis=-2))
    norminf = jnp.max(jnp.sum(jnp.abs(A), axis=-1))
    bound = jnp.minimum(norm1 * norminf, jnp.sum(A * A))
    X = A.T / jnp.maximum(bound, jnp.finfo(A.dtype).tiny)
    eye = jnp.eye(m, dtype=A.dtype)

    def body(_, X):
        return X @ (2.0 * eye - A @ X)

    return lax.fori_loop(0, iters, body, X)


@_full_precision
def sigma_max(A, iters=24, key=None):
    """Largest singular value by power iteration on A A' (pure matmuls)."""
    A = jnp.asarray(A)
    m = A.shape[-2]
    v = jnp.ones((m,), dtype=A.dtype) / jnp.sqrt(m)

    def body(_, v):
        w = A @ (A.T @ v)
        return w / jnp.maximum(jnp.linalg.norm(w), jnp.finfo(A.dtype).tiny)

    v = lax.fori_loop(0, iters, body, v)
    return jnp.sqrt(jnp.maximum(jnp.sum(v * (A @ (A.T @ v))), 0.0))


def _round_robin_rounds(n):
    """Round-robin tournament schedule: (n-1, n//2, 2) disjoint index pairs
    per round covering all n(n-1)/2 pairs once (n even). Host-side, static."""
    import numpy as np

    players = list(range(n))
    rounds = []
    for _ in range(n - 1):
        rounds.append([(players[i], players[n - 1 - i]) for i in range(n // 2)])
        players = [players[0], players[-1]] + players[1:-1]
    return np.asarray(rounds)


@_full_precision
def svd(A, sweeps=16):
    """Thin SVD by one-sided (Hestenes) Jacobi — no LAPACK custom call.

    Orthogonalizes the columns of A by plane rotations, applied to n//2
    *disjoint* column pairs at once (round-robin ordering), so each round is
    a batched gather / 2x2 rotation / scatter — VPU-friendly, jit/vmap-safe,
    and available on TPU backends without SVD custom calls. Works directly on
    A (no Gram squaring), so accuracy is ~eps * cond(A), like LAPACK.

    Returns (U, s, VT) with s descending, shapes as
    `jnp.linalg.svd(A, full_matrices=False)`. Cost: (n-1) * sweeps rounds of
    O(m n) work — meant for the small/skinny matrices of the analysis layer
    (ensembles, weight matrices), not for huge square inputs.
    """
    A = jnp.asarray(A)
    m, n = A.shape
    k = min(m, n)
    # Pad the column count to even for the round-robin pairing.
    n_p = n + (n % 2)
    if n_p != n:
        A = jnp.pad(A, ((0, 0), (0, 1)))
    rounds = jnp.asarray(_round_robin_rounds(n_p))  # (n_p-1, n_p//2, 2)
    V = jnp.eye(n_p, dtype=A.dtype)
    eps = jnp.finfo(A.dtype).eps

    def one_round(carry, pq):
        A, V = carry
        p, q = pq[:, 0], pq[:, 1]
        Ap, Aq = A[:, p], A[:, q]
        alpha = jnp.sum(Ap * Ap, axis=0)
        beta = jnp.sum(Aq * Aq, axis=0)
        gamma = jnp.sum(Ap * Aq, axis=0)
        # Hestenes rotation zeroing the (p,q) column inner product.
        denom = jnp.where(gamma == 0, 1.0, 2.0 * gamma)
        tau = (beta - alpha) / denom
        # sign(0) = 0 would skip the needed 45-degree rotation when the two
        # column norms are equal; treat tau = 0 as positive.
        sgn = jnp.where(tau >= 0, 1.0, -1.0)
        t = sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        # Skip already-orthogonal pairs (also avoids 0/0 for zero columns).
        tiny = jnp.abs(gamma) <= eps * jnp.sqrt(alpha * beta)
        t = jnp.where(tiny, 0.0, t)
        c = lax.rsqrt(1.0 + t * t)
        s = t * c
        Ap_new = c * Ap - s * Aq
        Aq_new = s * Ap + c * Aq
        A = A.at[:, p].set(Ap_new).at[:, q].set(Aq_new)
        Vp, Vq = V[:, p], V[:, q]
        V = V.at[:, p].set(c * Vp - s * Vq).at[:, q].set(s * Vp + c * Vq)
        return (A, V), None

    def one_sweep(_, AV):
        (A, V), _ = lax.scan(one_round, AV, rounds)
        return (A, V)

    A, V = lax.fori_loop(0, sweeps, one_sweep, (A, V))
    s_all = jnp.sqrt(jnp.sum(A * A, axis=0))
    order = jnp.argsort(-s_all)[:k]
    s = s_all[order]
    safe = jnp.where(s > 0, s, 1.0)
    U = A[:, order] / safe
    U = jnp.where(s > 0, U, 0.0)
    return U, s, V[:n, order].T


def eigh_psd(A, sweeps=16):
    """Eigendecomposition of a symmetric PSD matrix via the one-sided Jacobi
    SVD (for PSD A, A = V diag(s) V'). Returns (eigvals desc, V)."""
    _, s, VT = svd(A, sweeps=sweeps)
    return s, VT.T


@_full_precision
def sqrtm_psd(A, iters=60):
    """Symmetric PSD matrix square root by the coupled Newton-Schulz
    iteration (Denman-Beavers variant) — pure GEMMs, no eigh/cholesky.

    For *singular* A the coupled iterate Z tracks A^{-1/2}, which is
    unbounded in the null directions: the iteration converges and THEN blows
    up (measured: residual 1e-10 at 30 iterations, 1e24 at 50 on the
    256x256 geostat covariance). So the loop tracks the residual
    ||Y@Y - A||_max each step, keeps the best iterate, and exits early once
    the residual starts growing — a `lax.while_loop` with static bound
    `iters`, one extra GEMM per step.
    """
    A = jnp.asarray(A)
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)
    As = _sym(A)
    lam = jnp.maximum(jnp.max(jnp.sum(jnp.abs(As), axis=1)), jnp.finfo(A.dtype).tiny)
    As = As / lam
    Y = As
    Z = eye

    def resid(Y):
        return jnp.max(jnp.abs(Y @ Y - As))

    # state: Y, Z, best_Y, best_res, cur_res, k
    state = (Y, Z, Y, resid(Y), resid(Y), 0)

    def cond(s):
        _, _, _, best, cur, k = s
        return (k < iters) & (cur <= 4.0 * best)

    def body(s):
        Y, Z, bY, best, _, k = s
        T = 0.5 * (3.0 * eye - Z @ Y)
        Y = Y @ T
        Z = T @ Z
        r = resid(Y)
        better = r < best
        bY = jnp.where(better, Y, bY)
        best = jnp.where(better, r, best)
        return (Y, Z, bY, best, r, k + 1)

    _, _, bY, _, _, _ = lax.while_loop(cond, body, state)
    return _sym(bY) * jnp.sqrt(lam)


@_full_precision
def rinv_tikh(A, reg, sigma_iters=24, ns_iters=40):
    """Tikhonov-regularized right pseudo-inverse, SVD-free.

    Equals the reference's `rinv(A, reg, tikh=True)` (tools/utils.py:70-90):
    with reg' = reg * sigma_max(A),
        rinv(A) = V diag(s/(s^2+reg'^2)) U' = A' (A A' + reg'^2 I)^{-1}.
    """
    A = jnp.asarray(A)
    r = reg * sigma_max(A, iters=sigma_iters)
    m = A.shape[-2]
    G = A @ A.T + (r * r) * jnp.eye(m, dtype=A.dtype)
    return A.T @ spd_inverse(G, iters=ns_iters)
