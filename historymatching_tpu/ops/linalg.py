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
def spd_inverse(A, iters=50, jitter=0.0):
    """Inverse of an SPD matrix by diagonally-scaled Newton-Schulz."""
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

    def body(_, X):
        AX = As @ X
        X = X @ (2.0 * eye - AX)
        return _sym(X)

    X = lax.fori_loop(0, iters, body, X)
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
