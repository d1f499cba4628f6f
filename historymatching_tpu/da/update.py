"""Ensemble analysis (Kalman/conditioning) updates.

TPU-first re-design of the reference's DA layer (SURVEY.md C1h-C1l):

- `ens_update0` — stochastic ensemble smoother (ES). Same math as reference
  HistoryMatch.py:578-586 (transposed convention, rows = members), but the
  inversion is a Cholesky solve, and when nObs > N the ensemble-space
  (Woodbury) form is used: pinv(S'S + cI) S' == S' pinv(SS' + cI), so the
  solve is N x N instead of p x p. All dense MXU matmuls.
- `ens_update0_loc` — localized ES: per-state-element ("local/domain")
  analysis, `vmap`ed over cells with *masked full-width* algebra: tapered
  columns with weight below the reference's cutoff (sqrt(taper) > 1e-2,
  HistoryMatch.py:789) are zeroed, which reproduces the reference's ragged
  column-subset update exactly (zero columns decouple from the solve).
- `ies` / `iles` — subspace Gauss-Newton iterative smoothers (Raanes et al.
  2019; reference HistoryMatch.py:906-944, 1007-1064). The GN posterior
  covariance of w is the resolvent (Y0 Y0' + (N-1)I)^{-1}, algebraically
  identical to the reference's SVD-with-excess-N-zero-padding (see _gn_covw)
  but factorization-free (Newton-Schulz SPD inverse).
- `es_mda` — ensemble smoother with multiple data assimilation (not in the
  reference; required by BASELINE.md): iterate `ens_update0` with obs-error
  covariance inflated by alpha_i, sum(1/alpha_i) = 1.

ES0 (data-space inversion, reference HistoryMatch.py:1156) is `ens_update0`
applied to the production-forecast ensemble itself — no separate code needed.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from historymatching_tpu.ops.linalg import _full_precision, pinv, spd_solve
from historymatching_tpu.utils import center, gaussian_noise


def decorrelator(R12):
    """Whitening operator from a lower Cholesky factor of R: inv(R12.T),
    applied from the right to row-vector samples (reference HistoryMatch.py:639).

    Computed on the host (R12 is concrete setup data; triangular inversion
    is not a device op on this TPU backend)."""
    return jnp.asarray(np.linalg.inv(np.asarray(R12).T))


@_full_precision
def _kalman_term(S, D, X):
    """Compute D @ inv(S'S + (N-1)I) @ S' @ X, choosing obs- or
    ensemble-space form by static dims."""
    N = S.shape[0]
    p = S.shape[1]
    c = N - 1.0
    if p <= N:
        C = S.T @ S + c * jnp.eye(p, dtype=S.dtype)
        return D @ spd_solve(C, S.T @ X)
    G = S @ S.T + c * jnp.eye(N, dtype=S.dtype)
    return (D @ S.T) @ spd_solve(G, X)


@jax.jit
@_full_precision
def ens_update0(prior_ens, obs_ens, obs, perturbs, decorr):
    """Stochastic ES analysis update (rows = members). jitted at the API
    boundary (single fused device program; required for TPU backends without
    eager dispatch of loop primitives).

    Args mirror the reference (HistoryMatch.py:578-586): `obs_ens` is the
    observed ensemble (N, p); `obs` the data vector (p,); `perturbs` (N, p)
    sampled with the obs-error law; `decorr` the whitening matrix.
    """
    prior_ens = jnp.asarray(prior_ens)
    X, _ = center(prior_ens)
    Y, _ = center(jnp.asarray(obs_ens))
    S = Y @ decorr
    D = (obs - obs_ens - perturbs) @ decorr
    return prior_ens + _kalman_term(S, D, X)


def _taper_weights(taper):
    """Squared taper with the reference's activation cutoff
    (ci = sqrt(taper) > 1e-2  <=>  taper > 1e-4)."""
    taper = jnp.asarray(taper)
    return jnp.where(taper > 1e-4, taper, 0.0)


@jax.jit
@_full_precision
def ens_update0_loc(prior_ens, obs_ens, obs, perturbs, decorr, taper):
    """Localized (local/domain analysis) ES update. jitted (see ens_update0).

    `taper` has shape (M, p): taper[i, j] weights obs j for state element i
    (reference HistoryMatch.py:774-797). The per-cell update
        dE_i = D_i inv(S_i'S_i + cI) S_i' X[:, i],  S_i = S * c_i
    is evaluated in ensemble space,
        dE_i = (D w_i) S' inv(S diag(w_i) S' + cI) X[:, i],  w_i = c_i^2,
    and vmapped over all M cells — batched N x N solves on the MXU instead of
    the reference's Python `map` over ragged obs subsets.
    """
    prior_ens = jnp.asarray(prior_ens)
    N = prior_ens.shape[0]
    X, _ = center(prior_ens)
    Y, _ = center(jnp.asarray(obs_ens))
    S = Y @ decorr
    D = (obs - obs_ens - perturbs) @ decorr
    W = _taper_weights(taper)  # (M, p)
    c = N - 1.0
    eye = jnp.eye(N, dtype=S.dtype)

    def local(x_col, w):
        Sw = S * w  # (N, p) — S diag(w)
        G = Sw @ S.T + c * eye
        G = 0.5 * (G + G.T)  # symmetrize (floating point)
        return (D * w) @ (S.T @ spd_solve(G, x_col))

    dE = jax.vmap(local, in_axes=(1, 0), out_axes=1)(X, W)  # (N, M)
    return prior_ens + dE


@jax.jit
@_full_precision
def ens_update0_loc_domains(prior_ens, obs_ens, obs, perturbs, decorr, taper_dom, domains):
    """Domain-batched localized ES update.

    The reference notes a batched variant of the local analysis ("sequentially
    processing batches, i.e. subsets/domains", HistoryMatch.py:802-804) built
    on `rectangular_partitioning`. Cells within a domain share one taper row
    (piecewise-constant localization), so each domain needs ONE ensemble-space
    solve instead of one per cell — O(nDom) solves instead of O(Nxy). This is
    what makes localization affordable at 64x64+ with N=1000.

    Parameters
    ----------
    taper_dom : (nDom, p) per-domain taper (e.g. bump(dist(domain centre,
        obs)/radius)).
    domains : (nDom, cells_per_domain) int array of flat cell indices (from
        `localization.domain_partition`); equal-sized domains covering every
        state element exactly once. Implemented as a `lax.scan` over domains
        (an unrolled loop at nDom ~ 256 explodes compile time).
    """
    prior_ens = jnp.asarray(prior_ens)
    N = prior_ens.shape[0]
    X, _ = center(prior_ens)
    Y, _ = center(jnp.asarray(obs_ens))
    S = Y @ decorr
    D = (obs - obs_ens - perturbs) @ decorr
    W = _taper_weights(taper_dom).astype(S.dtype)  # (nDom, p)
    p = S.shape[1]
    c = N - 1.0
    domains = jnp.asarray(domains, jnp.int32)

    if p <= N:
        # Obs-space form (p x p solves): by the push-through identity
        #   (D*w) S' (S diag(w) S' + cI)^{-1} == (D*c_d) (S_d'S_d + cI)^{-1} S_d'
        # with S_d = S * sqrt(w) — identical to the ensemble-space branch
        # below (tested), but the solve is p x p instead of N x N: at the
        # bench scale (N=1000, p=160, 256 domains) that is ~200x fewer
        # FLOPs (measured: the localized ES-MDA run dropped ~11 s).
        eye_p = jnp.eye(p, dtype=S.dtype)

        def body(E_new, dom):
            idx, w = dom
            cd = jnp.sqrt(w)
            Sd = S * cd
            G = Sd.T @ Sd + c * eye_p
            G = 0.5 * (G + G.T)
            dE = (D * cd) @ spd_solve(G, Sd.T @ X[:, idx])
            E_new = E_new.at[:, idx].set(prior_ens[:, idx] + dE)
            return E_new, None
    else:
        eye = jnp.eye(N, dtype=S.dtype)

        def body(E_new, dom):
            idx, w = dom
            Sw = S * w
            G = Sw @ S.T + c * eye
            G = 0.5 * (G + G.T)
            dE = (D * w) @ (S.T @ spd_solve(G, X[:, idx]))
            E_new = E_new.at[:, idx].set(prior_ens[:, idx] + dE)
            return E_new, None

    E_new, _ = jax.lax.scan(body, prior_ens, (domains, W))
    return E_new


# -- iterative smoothers -------------------------------------------------------


def _gn_covw(Y0, N):
    """Gauss-Newton posterior covariance of w.

    The reference forms V diag(1/(N-1+s^2)) V' from an SVD of Y0 with
    "excess-N" zero-padding (HistoryMatch.py:934-938). Over the complete
    eigenbasis of G = Y0 Y0' that is *exactly* the resolvent
    (G + (N-1) I)^{-1} — an SPD inverse, no factorization needed."""
    G = Y0 @ Y0.T
    G = 0.5 * (G + G.T) + (N - 1.0) * jnp.eye(N, dtype=Y0.dtype)
    return spd_solve(G, jnp.eye(N, dtype=Y0.dtype))


@_full_precision
def _ies_inner(W, Eo_w, y_w, D_w, xStep):
    """One jitted IES Gauss-Newton step in the N x N weight matrix W."""
    N = W.shape[0]
    W0 = jnp.eye(N, dtype=W.dtype)
    Y0 = center(pinv(W))[0] @ Eo_w
    grad_y = (y_w - D_w - Eo_w) @ Y0.T
    grad_b = (N - 1.0) * (W0 - W)
    covw = _gn_covw(Y0, N)
    W_new = W + xStep * ((grad_y + grad_b) @ covw)
    # float32 safeguard: if the GN step overflowed or exploded (degenerate W
    # / extreme members — reference weights live in ~[-0.5, 1]), keep the
    # previous weights instead of poisoning the run.
    ok = jnp.all(jnp.isfinite(W_new)) & (jnp.max(jnp.abs(W_new)) < 1e3)
    return jnp.where(ok, W_new, W)


def ies(prior_ens, obs_ens, obs, perturbs, decorr, xStep=1.0, iMax=4,
        callback=None):
    """Iterative ensemble smoother (subspace GN; reference HistoryMatch.py:906-944).

    `obs_ens` is a *callable* E -> observed ensemble (the forward model runs
    once per iteration; host loop around a jitted inner step). It may also be
    a SEQUENCE of iMax per-iteration callables — e.g. a cheaper solver
    tolerance for the early Gauss-Newton iterations, whose innovations only
    steer intermediate weight matrices, and the full-accuracy operator for
    the last (the `es_mda` per-pass-forward analogue; quality gated by the
    IES parity harness, scripts/parity.py --ies).
    Returns (posterior_ens, stats) with stats = {"E": [...], "Eo": [...]}.
    `callback` (optional): per-iteration progress hook — iMax host
    iterations each cost N simulations, so long runs should report; called
    with dict(iter, iMax, elapsed_s, E, Eo, W) after each forward+GN step
    (reference analogue: the tqdm bars threaded through `apply`,
    tools/utils.py:245-269).
    """
    prior_ens = jnp.asarray(prior_ens)
    fwd_per_iter = (list(obs_ens) if isinstance(obs_ens, (list, tuple))
                    else [obs_ens] * iMax)
    if len(fwd_per_iter) != iMax:
        raise ValueError(f"{len(fwd_per_iter)} forward operators for "
                         f"{iMax} IES iterations")
    y = jnp.asarray(obs) @ decorr
    D = jnp.asarray(perturbs) @ decorr
    X0, x0 = center(prior_ens)
    W = jnp.eye(prior_ens.shape[0], dtype=prior_ens.dtype)
    inner = jax.jit(_ies_inner)
    stats = {"E": [], "Eo": []}
    t0 = time.perf_counter()
    for itr in range(iMax):
        E = x0 + W @ X0
        Eo = jnp.asarray(fwd_per_iter[itr](E))
        stats["E"].append(E)
        stats["Eo"].append(Eo)
        W = inner(W, Eo @ decorr, y, D, xStep)
        if callback is not None:
            jax.block_until_ready(W)
            callback(dict(iter=itr + 1, iMax=iMax,
                          elapsed_s=time.perf_counter() - t0,
                          E=E, Eo=Eo, W=W))
    stats = {k: jnp.stack(v) for k, v in stats.items()}
    return x0 + W @ X0, stats


@_full_precision
def _iles_inner(Ws, Eo_w, obs_w_innov, xStep, weights):
    """One jitted ILES step: per-cell GN update of Ws (M, N, N).

    `obs_w_innov` = (obs - Eo - perturbs) @ decorr, (N, p).
    `weights` = squared taper with cutoff, (M, p).
    """
    N = Ws.shape[1]
    W0 = jnp.eye(N, dtype=Ws.dtype)
    S, _ = center(Eo_w)

    def local(Wi, w):
        # With c = sqrt(taper) the reference uses Si = S*c, Di = D*c,
        # Y0i = T @ Si (T = centered pinv(Wi)). Folding both c factors into
        # w = c^2 on one side: grad_y = Di Y0i' = (D*w) B',
        # Y0i Y0i' = (B*w) B', where B = T @ S. The SVD-with-padding covw is
        # the resolvent ((B*w)B' + (N-1)I)^{-1} (see _gn_covw).
        B = center(pinv(Wi))[0] @ S
        grad_y = (obs_w_innov * w) @ B.T
        G = (B * w) @ B.T
        G = 0.5 * (G + G.T) + (N - 1.0) * jnp.eye(N, dtype=S.dtype)
        covw = spd_solve(G, jnp.eye(N, dtype=S.dtype))
        grad_b = (N - 1.0) * (W0 - Wi)
        Wi_new = Wi + xStep * ((grad_y + grad_b) @ covw)
        # float32 safeguard (see _ies_inner): cells whose local step
        # overflowed or exploded keep their previous weights.
        ok = jnp.all(jnp.isfinite(Wi_new)) & (jnp.max(jnp.abs(Wi_new)) < 1e3)
        return jnp.where(ok, Wi_new, Wi)

    return jax.vmap(local)(Ws, weights)


def _recompose(x0, X0, Ws):
    """E[:, i] = x0[i] + Ws[i] @ X0[:, i] (reference HistoryMatch.py:1020-1021)."""
    return x0 + jnp.einsum("mab,bm->am", Ws, X0)


def iles(prior_ens, obs_ens, obs, perturbs, decorr, taper, xStep=1.0, iMax=4,
         callback=None):
    """Localized iterative ensemble smoother: one weight matrix per state
    element (reference HistoryMatch.py:1007-1064), vmapped over cells.
    `callback`: per-iteration hook, see `ies` (receives Ws, not W)."""
    prior_ens = jnp.asarray(prior_ens)
    N, M = prior_ens.shape
    X0, x0 = center(prior_ens)
    Ws = jnp.broadcast_to(jnp.eye(N, dtype=prior_ens.dtype), (M, N, N))
    weights = _taper_weights(taper)
    inner = jax.jit(_iles_inner)
    stats = {"E": [], "Eo": []}
    t0 = time.perf_counter()
    for itr in range(iMax):
        E = _recompose(x0, X0, Ws)
        Eo = jnp.asarray(obs_ens(E))
        stats["E"].append(E)
        stats["Eo"].append(Eo)
        innov = (jnp.asarray(obs) - Eo - perturbs) @ decorr
        Ws = inner(Ws, Eo @ decorr, innov, xStep, weights)
        if callback is not None:
            jax.block_until_ready(Ws)
            callback(dict(iter=itr + 1, iMax=iMax,
                          elapsed_s=time.perf_counter() - t0,
                          E=E, Eo=Eo, Ws=Ws))
    stats = {k: jnp.stack(v) for k, v in stats.items()}
    return _recompose(x0, X0, Ws), stats


def _recompose_domains(x0, X0, Ws, domains):
    """Domain-blocked recompose: E[:, domains[d]] = x0[domains[d]]
    + Ws[d] @ X0[:, domains[d]] (domains partition the cells exactly once)."""
    Xd = X0[:, domains]  # (N, nDom, k)
    Ed = x0[domains] + jnp.einsum("dab,bdk->adk", Ws, Xd)  # (N, nDom, k)
    N, M = X0.shape
    return jnp.zeros((N, M), X0.dtype).at[:, domains.reshape(-1)].set(
        Ed.reshape(N, -1)
    )


def iles_domains(prior_ens, obs_ens, obs, perturbs, decorr, taper_dom, domains,
                 xStep=1.0, iMax=4, callback=None):
    """Domain-batched localized iterative ensemble smoother.

    The per-cell ILES (above) materializes one N x N weight matrix per state
    element — (M, N, N) memory, impossible at the flagship scale (64x64 grid,
    N=1000: 16 TB). Cells within a domain share one W (piecewise-constant
    localization, the LES analogue of `ens_update0_loc_domains`), so the
    state is (nDom, N, N) — e.g. 256 x 1000 x 1000 ~ 1 GB — and each GN step
    is nDom batched MXU solves instead of M.

    With singleton domains (domains = arange(M)[:, None], taper_dom = taper)
    this reproduces `iles` exactly (tested). Same return contract as `iles`;
    `callback`: per-iteration hook, see `ies` (receives Ws).
    """
    prior_ens = jnp.asarray(prior_ens)
    N = prior_ens.shape[0]
    domains = jnp.asarray(domains, jnp.int32)
    X0, x0 = center(prior_ens)
    nDom = domains.shape[0]
    Ws = jnp.broadcast_to(jnp.eye(N, dtype=prior_ens.dtype), (nDom, N, N))
    weights = _taper_weights(taper_dom)
    inner = jax.jit(_iles_inner)
    recompose = jax.jit(_recompose_domains)
    stats = {"E": [], "Eo": []}
    t0 = time.perf_counter()
    for itr in range(iMax):
        E = recompose(x0, X0, Ws, domains)
        Eo = jnp.asarray(obs_ens(E))
        stats["E"].append(E)
        stats["Eo"].append(Eo)
        innov = (jnp.asarray(obs) - Eo - perturbs) @ decorr
        Ws = inner(Ws, Eo @ decorr, innov, xStep, weights)
        if callback is not None:
            jax.block_until_ready(Ws)
            callback(dict(iter=itr + 1, iMax=iMax,
                          elapsed_s=time.perf_counter() - t0,
                          E=E, Eo=Eo, Ws=Ws))
    stats = {k: jnp.stack(v) for k, v in stats.items()}
    return recompose(x0, X0, Ws, domains), stats


# -- ES-MDA --------------------------------------------------------------------


def mda_alphas(n):
    """Canonical constant MDA inflation schedule: alpha_i = n, sum 1/alpha = 1."""
    return jnp.full((n,), float(n))


def es_mda(prior_ens, forward_obs, obs, R12, alphas, key, taper=None, domains=None,
           taper_dom=None, noise_dtype=jnp.float32, callback=None, start_pass=0):
    """ES-MDA: iterated stochastic ES with inflated obs-error covariance.

    Each step i re-runs `forward_obs` on the current ensemble and applies
    `ens_update0` (or the per-cell localized variant if `taper` is given, or
    the domain-batched localized variant if `domains` + `taper_dom` are
    given) with R -> alpha_i R: perturbs *= sqrt(alpha_i),
    decorr /= sqrt(alpha_i). With alphas = [1.0] this is exactly one ES step.

    `forward_obs` may also be a SEQUENCE of per-pass callables (len(alphas))
    — e.g. a cheaper solver tolerance for the early passes, whose
    innovations only steer intermediate ensembles, and the full-accuracy
    operator for the final pass(es).

    `noise_dtype` (default float32): the perturbation draws are made in this
    dtype and cast to the pipeline's — so float32 and float64 runs of the
    same key see IDENTICAL noise (paired-seed parity testing); pass None to
    draw in the pipeline dtype.

    `callback` (optional): progress/checkpoint hook, called after each pass
    with dict(pass_=i+1, n_passes, alpha, elapsed_s, E, key) — `E` is the
    post-update ensemble and `key` the RNG state for the REMAINING passes,
    exactly what a resume needs (`checkpoint.save_checkpoint` the pair).

    `start_pass` (default 0): resume support — skip the first `start_pass`
    passes entirely (no RNG splits), continuing from `prior_ens`/`key` as
    captured by a pass-`start_pass` callback. The resumed run bit-matches
    the uninterrupted one (tests/test_aux.py::test_es_mda_resume).
    """
    E = jnp.asarray(prior_ens)
    dtype = E.dtype  # the whole pass stays in the ensemble's precision
    R12 = jnp.asarray(R12).astype(dtype)
    p = R12.shape[0]
    N = E.shape[0]
    dec0 = decorrelator(R12).astype(dtype)
    R12_noise = R12.astype(noise_dtype) if noise_dtype is not None else R12
    alphas = jnp.asarray(alphas).astype(dtype)
    fwd_per_pass = (list(forward_obs) if isinstance(forward_obs, (list, tuple))
                    else [forward_obs] * len(alphas))
    if len(fwd_per_pass) != len(alphas):
        raise ValueError(f"{len(fwd_per_pass)} forward operators for "
                         f"{len(alphas)} MDA passes")
    t0 = time.perf_counter()
    for i, (a, fwd) in enumerate(zip(alphas, fwd_per_pass)):
        if i < start_pass:
            continue
        key, sub = jax.random.split(key)
        Eo = jnp.asarray(fwd(E)).astype(dtype)
        perturbs = jnp.sqrt(a) * gaussian_noise(sub, N, p, L=R12_noise).astype(dtype)
        dec = dec0 / jnp.sqrt(a)
        if domains is not None:
            E = ens_update0_loc_domains(E, Eo, obs, perturbs, dec, taper_dom, domains)
        elif taper is not None:
            E = ens_update0_loc(E, Eo, obs, perturbs, dec, taper)
        else:
            E = ens_update0(E, Eo, obs, perturbs, dec)
        if callback is not None:
            jax.block_until_ready(E)
            callback(dict(pass_=i + 1, n_passes=len(fwd_per_pass),
                          alpha=float(a), elapsed_s=time.perf_counter() - t0,
                          E=E, key=key))
    return E
