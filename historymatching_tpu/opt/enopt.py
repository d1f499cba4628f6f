"""EnOpt: ensemble-gradient estimation, batched line search, gradient descent.

TPU-first re-design of the reference's `tools/enopt.py` / Optimise.py:235-343:

- `EnGrad` (the reference's `nabla_ens`): samples a control-perturbation
  ensemble with an explicit PRNG key and evaluates the objective *batched*
  (one `vmap`ped compiled call) instead of a process pool. Supports the
  preconditioned form, LLS (Tikhonov-regularized pseudo-inverse) form, and
  the robust strategies "Paired" / "StoSAG" / "Mean-model" / naive
  (reference Optimise.py:833-853).
- `Backtracker`: evaluates *all* trial step lengths in one batch and takes
  the first acceptable — deterministically equivalent to the reference's
  serial accept-first loop (Optimise.py:289-299), but a single device
  launch (the reference's importable variant already batched trials across
  CPUs, tools/enopt.py:45-61).
- `GD`: host-side outer loop (cheap; simulation work inside is compiled).
"""

from __future__ import annotations

import dataclasses
import weakref
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from historymatching_tpu.ops.linalg import rinv_tikh
from historymatching_tpu.utils import center, gaussian_noise

# jit-compiled transforms of user objectives, cached per objective object so
# repeated GD iterations reuse the compilation (and so nothing runs eagerly —
# some TPU backends cannot eager-dispatch loop primitives at all).
_XFORM_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _cached_xform(obj, tag, make):
    try:
        per_obj = _XFORM_CACHE.setdefault(obj, {})
    except TypeError:  # non-weakrefable callable
        return jax.jit(make(obj))
    if tag not in per_obj:
        per_obj[tag] = jax.jit(make(obj))
    return per_obj[tag]


def _batched(obj):
    """Lift a single-point objective to batches: jit(vmap(obj)), cached."""
    return _cached_xform(obj, "vmap", jax.vmap)


@partial(jax.jit, static_argnames=("nEns", "M"))
def _sample_dU(key, nEns, M, chol):
    return center(gaussian_noise(key, nEns, M, chol))[0]


@jax.jit
def _grad_precond(dU, dJ):
    return dU.T @ dJ / (dU.shape[0] - 1)


@jax.jit
def _grad_lls(dU, dJ):
    # Tikhonov-LLS form (reference tools/enopt.py:30), via the SVD-free
    # identity rinv(A) = A'(AA' + reg^2 I)^{-1} (runs on any backend).
    return rinv_tikh(dU, reg=0.1) @ dJ


@dataclasses.dataclass
class EnGrad:
    """Ensemble gradient estimate (LLS regression) — `nabla_ens` equivalent."""

    chol: Any = 1.0  # Cholesky factor (M, M) or scalar std-dev
    nEns: int = 10
    precond: bool = False
    robustly: Optional[str] = None  # None | "Paired" | "StoSAG" | "Mean-model" | "naive"
    obj_ux: Optional[Callable] = None  # conditional objective obj1(u, x)
    X: Any = None  # uncertainty ensemble (nEns_x, dx)

    def __call__(self, obj, u, key):
        u = jnp.asarray(u)
        dU = _sample_dU(key, self.nEns, u.shape[0], jnp.asarray(self.chol))
        dJ = jnp.asarray(self.ens_eval(obj, u, u + dU))
        if self.precond:
            return _grad_precond(dU, dJ)
        return _grad_lls(dU, dJ)

    def ens_eval(self, obj, u, U):
        """Objective increments for the perturbation ensemble `U` (nEns, d).

        Robust strategies follow reference Optimise.py:833-853; the paired
        forms require len(X) == nEns (members are zipped pairwise).
        """
        if self.robustly in (None, "naive"):
            return _batched(obj)(U)
        X = jnp.asarray(self.X)
        obj_ux = self.obj_ux
        vmap_pair = lambda f: jax.vmap(f)  # noqa: E731
        vmap_u = lambda f: jax.vmap(f, in_axes=(0, None))  # noqa: E731
        vmap_x = lambda f: jax.vmap(f, in_axes=(None, 0))  # noqa: E731
        if self.robustly == "Paired":
            return _cached_xform(obj_ux, "pair", vmap_pair)(U, X)
        if self.robustly == "StoSAG":
            JU = _cached_xform(obj_ux, "pair", vmap_pair)(U, X)
            Ju = _cached_xform(obj_ux, "x", vmap_x)(u, X)
            return JU - Ju
        if self.robustly in ("Mean-model", "Fragile"):
            return _cached_xform(obj_ux, "u", vmap_u)(U, X.mean(0))
        raise ValueError(f"Unknown robust strategy {self.robustly!r}")


@dataclasses.dataclass
class Backtracker:
    """Batched backtracking line search (accept-first semantics)."""

    sign: int = +1  # maximise (+1) or minimise (-1)
    xSteps: tuple = tuple(0.5 ** (i + 1) for i in range(8))
    rtol: float = 1e-8

    def __call__(self, obj, u0, J0, search_direction):
        u0 = jnp.asarray(u0)
        atol = max(1e-8, abs(float(J0))) * self.rtol
        steps = jnp.asarray(self.xSteps, dtype=u0.dtype)
        U1 = u0[None, :] + self.sign * steps[:, None] * jnp.asarray(search_direction)[None, :]
        J1 = np.asarray(_batched(obj)(U1))
        dJ = self.sign * (J1 - float(J0))
        ok = dJ > atol
        if not ok.any():
            return None
        i = int(np.argmax(ok))
        return np.asarray(U1[i]), float(J1[i]), dict(nDeclined=i)


@partial(jax.jit, static_argnames=("objective", "nEns", "precond", "nrmlz",
                                   "nIter", "sign", "xSteps", "rtol"))
def _gd_scan_impl(objective, u0, key, chol, nEns, precond, nrmlz, nIter, sign,
                  xSteps, rtol):
    from jax import lax

    u0 = jnp.asarray(u0)
    M = u0.shape[0]
    steps = jnp.asarray(xSteps, dtype=u0.dtype)

    def obj_v(U):
        return jax.vmap(objective)(U)

    def step(carry, _):
        u, J, done, key = carry
        key, sub = jax.random.split(key)
        dU = center(gaussian_noise(sub, nEns, M, chol))[0]
        dJ = obj_v(u + dU)
        g = _grad_precond(dU, dJ) if precond else _grad_lls(dU, dJ)
        if nrmlz:
            # Zero-gradient guard (flat objective, e.g. pre-breakthrough NPV):
            # 0/0 would NaN every trial point; a zero direction instead makes
            # all trials == u, none accepted, and the state freezes (= GD's
            # converged exit).
            gn = jnp.sqrt(jnp.mean(g * g))
            g = jnp.where(gn > 0, g / jnp.where(gn > 0, gn, 1.0), 0.0)
        U1 = u[None, :] + sign * steps[:, None] * g[None, :]
        J1 = obj_v(U1)
        atol = jnp.maximum(1e-8, jnp.abs(J)) * rtol
        ok = sign * (J1 - J) > atol
        any_ok = jnp.any(ok)
        i = jnp.argmax(ok)
        accept = any_ok & ~done
        u_new = jnp.where(accept, U1[i], u)
        J_new = jnp.where(accept, J1[i], J)
        done = done | ~any_ok
        return (u_new, J_new, done, key), (u_new, J_new, done)

    J0 = objective(u0)
    (_, _, done, _), (path, objs, dones) = lax.scan(
        step, (u0, J0, jnp.asarray(False), key), None, length=nIter
    )
    path = jnp.concatenate([u0[None], path])
    objs = jnp.concatenate([J0[None], objs])
    return path, objs, dones


def gd_scan(objective, u, *, chol=1.0, nEns=10, precond=False, nrmlz=True,
            nIter=100, sign=+1, xSteps=None, rtol=1e-8, key=None):
    """Fully on-device GD: the whole optimisation is ONE compiled program
    (`lax.scan` over iterations), eliminating the per-iteration host
    round-trips of `GD` (gradient pull, line-search sync) — the round-1
    review's EnOpt throughput floor. Semantically equivalent to
    `GD(obj, u, EnGrad(chol, nEns, precond), Backtracker(sign, ...))` with
    the same key (tested: identical trajectories on toys); after
    convergence (no acceptable trial step) the state freezes, like GD's
    early exit, so the fixed trip count does not change the answer.

    Returns (path, objs, info) like `GD`; `objective` must be jit-traceable
    (every objective in this package is). Robust strategies: wrap the
    uncertainty mean into `objective` itself, or use `GD` + `EnGrad`.
    """
    if xSteps is None:
        xSteps = tuple(0.5 ** (i + 1) for i in range(8))
    key = key if key is not None else jax.random.PRNGKey(0)
    u = jnp.asarray(u, dtype=jnp.result_type(float))
    path, objs, dones = _gd_scan_impl(
        objective, u, key, jnp.asarray(u.dtype.type(1) * jnp.asarray(chol)),
        int(nEns), bool(precond), bool(nrmlz), int(nIter), int(sign),
        tuple(xSteps), float(rtol),
    )
    dones = np.asarray(dones)
    n_eff = int(np.argmax(dones)) if dones.any() else int(nIter)
    info = dict(
        cause="GD converged" if dones.any() else "GD ran out of iters",
        nIter=n_eff,
        nEvals=1 + (n_eff + 1) * (nEns + len(xSteps)),
    )
    # Trim the frozen tail: row i of the scan output is the state after
    # iteration i, so initial + the n_eff accepted states = n_eff + 1 rows.
    path = np.asarray(path)[: n_eff + 1]
    objs = np.asarray(objs)[: n_eff + 1]
    return path, objs, info


def gd_scan_multi(objective, U0, *, chol=1.0, nEns=10, precond=False,
                  nrmlz=True, nIter=100, sign=+1, xSteps=None, rtol=1e-8,
                  key=None):
    """Batched multistart `gd_scan`: every start advances in ONE compiled
    program (`vmap` over the whole optimisation scan) — the reference's
    multi-start loop (Optimise.py:463-467 runs GD from 4 random initial
    guesses, serially) as a single device launch. Starts are embarrassingly
    parallel, so on TPU the batch costs about as much as the slowest start.

    `U0` is (nStart, M); each start consumes an independent PRNG stream
    split from `key`. Returns (paths (nStart, nIter+1, M), objs
    (nStart, nIter+1), info) where `info["nIter"]` is per-start; rows past
    a start's `nIter` are frozen at its converged state (same semantics as
    `gd_scan`'s trimmed tail, kept rectangular here for the batch).
    """
    if xSteps is None:
        xSteps = tuple(0.5 ** (i + 1) for i in range(8))
    key = key if key is not None else jax.random.PRNGKey(0)
    U0 = jnp.atleast_2d(jnp.asarray(U0, dtype=jnp.result_type(float)))
    keys = jax.random.split(key, U0.shape[0])
    chol_arr = jnp.asarray(U0.dtype.type(1) * jnp.asarray(chol))

    def one(u0, k):
        return _gd_scan_impl(objective, u0, k, chol_arr, int(nEns),
                             bool(precond), bool(nrmlz), int(nIter),
                             int(sign), tuple(xSteps), float(rtol))

    paths, objs, dones = jax.vmap(one)(U0, keys)
    dones = np.asarray(dones)  # (nStart, nIter)
    n_eff = np.where(dones.any(axis=1), np.argmax(dones, axis=1), int(nIter))
    info = dict(
        cause=["GD converged" if d.any() else "GD ran out of iters" for d in dones],
        nIter=n_eff,
        nEvals=1 + (n_eff + 1) * (nEns + len(xSteps)),
    )
    return np.asarray(paths), np.asarray(objs), info


def GD(objective, u, nabla=None, line_search=None, nrmlz=True, nIter=100, key=None,
       quiet=True, callback=None):
    """Gradient (steepest) descent/ascent driver (reference tools/enopt.py:75-107).

    Host-side outer loop; all objective evaluations inside `nabla` and
    `line_search` are batched compiled calls. Returns (path, objs, info):
    path (n+1, d) iterates, objs (n+1,) objective values, info dict-list.
    `callback` (optional): per-iteration progress hook, called with
    dict(iter, nIter, J, u, elapsed_s, accepted) after each gradient +
    line-search round (the reference threads tqdm bars instead,
    Optimise.py:315-318).
    """
    import time

    del quiet  # no progress bars: the loop body is a few compiled launches
    nabla = nabla if nabla is not None else EnGrad()
    line_search = line_search if line_search is not None else Backtracker()
    key = key if key is not None else jax.random.PRNGKey(0)

    u = jnp.asarray(u, dtype=jnp.result_type(float))
    obj_scalar = _cached_xform(objective, "scalar", lambda f: f)
    states = [[np.asarray(u), float(jnp.asarray(obj_scalar(u))), {}]]
    info = {}
    itr = 0
    t0 = time.perf_counter()
    for itr in range(nIter):
        u_cur, J, info = states[-1]
        key, sub = jax.random.split(key)
        grad = np.asarray(nabla(objective, jnp.asarray(u_cur), sub))
        info["grad"] = grad
        if nrmlz:
            gn = float(np.sqrt(np.mean(grad**2)))
            if gn == 0.0 or not np.isfinite(gn):
                # Flat (or invalid-everywhere) objective: no direction to
                # normalize — stop as converged rather than NaN the trials.
                info["cause"] = "GD converged"
                break
            grad = grad / gn
        updated = line_search(objective, u_cur, J, grad)
        if callback is not None:
            callback(dict(iter=itr + 1, nIter=nIter,
                          J=updated[1] if updated else J,
                          u=updated[0] if updated else u_cur,
                          elapsed_s=time.perf_counter() - t0,
                          accepted=bool(updated)))
        if updated:
            states.append([updated[0], updated[1], updated[2]])
        else:
            info["cause"] = "GD converged"
            break
    else:
        info["cause"] = "GD ran out of iters"
    info["nIter"] = itr
    # Objective-evaluation accounting (the reference tracks this via a
    # fun.nCalls attribute, tools/utils.py:227-228): initial eval + per
    # iteration nEns gradient evals (2x for StoSAG) + the full trial batch.
    per_grad = getattr(nabla, "nEns", 0) * (2 if getattr(nabla, "robustly", None) == "StoSAG" else 1)
    n_iters_run = len(states) - 1 + (0 if info.get("cause") == "GD ran out of iters" else 1)
    info["nEvals"] = 1 + n_iters_run * (per_grad + len(getattr(line_search, "xSteps", ())))

    path = np.asarray([s[0] for s in states])
    objs = np.asarray([s[1] for s in states])
    return path, objs, info
