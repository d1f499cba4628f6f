"""Distance-based localization: distances, tapers, partitioning.

Covers the reference's `tools/localization.py` (C5 in SURVEY.md: pairwise
distances with optional periodic domain, the "bump" compact-support taper
preferred over Gaspari-Cohn, and rectangular batch partitioning). All
distance/taper math is jnp and jit-safe; partitioning is host-side (static
index sets).
"""

from __future__ import annotations

import itertools

import jax.numpy as jnp
import numpy as np


def pairwise_distances(A, B=None, domain=None):
    """Euclidean distances between point sets.

    Parameters
    ----------
    A : (nA, nDims) points. A 1-D input is treated as a single point
        (same convention as reference tools/localization.py:58-60).
    B : (nB, nDims) points; defaults to `A`.
    domain : optional tuple of periods — treat the domain as a periodic
        hyper-rectangle: per-dim distance is min(|d|, L - |d|).

    Returns
    -------
    (nA, nB) distance matrix.
    """
    A = jnp.atleast_2d(jnp.asarray(A, dtype=jnp.result_type(float)))
    B = A if B is None else jnp.atleast_2d(jnp.asarray(B, dtype=jnp.result_type(float)))
    if A.shape[-1] != B.shape[-1]:
        raise ValueError("The last axis of A and B must have equal length.")
    d = A[:, None, :] - B[None, :, :]
    if domain is not None:
        L = jnp.reshape(jnp.asarray(domain, dtype=d.dtype), (1, 1, -1))
        d = jnp.abs(d)
        d = jnp.minimum(d, L - d)
    return jnp.sqrt(jnp.sum(d * d, axis=-1))


def bump(distances, sharpness=1):
    """Compact-support 'bump' taper: exp(1 - 1/(1-x^2))^sharpness for |x|<1,
    else 0 (reference tools/localization.py:86-92).

    jit-safe: the singular 1/(1-x^2) is guarded with a masked denominator.
    """
    x = jnp.asarray(distances)
    inside = jnp.abs(x) < 1
    denom = jnp.where(inside, 1 - x * x, 1.0)  # avoid div-by-0 outside support
    v = jnp.exp(1 - 1 / denom) ** sharpness
    return jnp.where(inside, v, 0.0)


def dist_to_obs(grid, obs_inds, nTime=1, domain=None):
    """Distances from every cell centre to each observation location,
    tiled over `nTime` (reference HistoryMatch.py:700-717).

    Returns (Nxy, nObs*nTime).
    """
    xy_prm = np.asarray(grid.ind2xy(np.arange(grid.Nxy))).T  # (Nxy, 2)
    xy_obs = np.asarray(grid.ind2xy(np.asarray(obs_inds))).T  # (nObs, 2)
    # Repeat the obs block once per time step, well index varying fastest —
    # flat obs index = t*nObs + well, matching the `vect` flattening of
    # (nTime, nPrd) series (reference HistoryMatch.py:712,744).
    xy_obs = np.tile(xy_obs, (nTime, 1))  # (nTime*nObs, 2)
    return pairwise_distances(xy_prm, xy_obs, domain=domain)


def dist_to_moving_obs(grid, xy_paths, domain=None):
    """Distances from every cell centre to TIME-DEPENDENT observation
    locations — the reference's experimental "moving mask" localization
    (HistoryMatch.py:853-858, disabled there by default): co-locate each
    observation's taper with the path of its correlation maxima
    (`xy_max_corr`) instead of centering it on the well for all times.

    xy_paths (nPrd, nTime, 2) as returned by `xy_max_corr`. Returns
    (Nxy, nTime*nPrd) with the same flat obs ordering as `dist_to_obs`
    (flat index = t*nPrd + well, well varying fastest — matching `vect`).
    Feed `bump(result / radius)` as the taper of `ens_update0_loc`."""
    xy_paths = np.asarray(xy_paths)
    nPrd, nTime, _ = xy_paths.shape
    xy_prm = np.asarray(grid.ind2xy(np.arange(grid.Nxy))).T  # (Nxy, 2)
    xy_obs = xy_paths.transpose(1, 0, 2).reshape(nTime * nPrd, 2)
    return pairwise_distances(xy_prm, xy_obs, domain=domain)


def xy_max_corr(grid, param_ens, prod_ens, t_min=6):
    """Trajectories of the correlation-field maxima per well over time
    (reference HistoryMatch.py:829-842): for each producer and time step,
    the (x, y) of the cell whose prior-parameter/production correlation is
    largest. Times before `t_min` carry almost zero correlation, so they
    fall back to the `t_min` location (reference :838-842).

    param_ens (N, Nxy); prod_ens (N, nTime, nPrd). Returns (nPrd, nTime, 2).
    Basis for experimental time-dependent localization (feed the result as
    obs coordinates to `pairwise_distances`).
    """
    from historymatching_tpu.utils import corr

    param_ens = jnp.asarray(param_ens)
    prod_ens = jnp.asarray(prod_ens)
    nTime, nPrd = prod_ens.shape[1], prod_ens.shape[2]

    def field_argmax(t, w):
        C = corr(param_ens, prod_ens[:, t, w])
        return jnp.asarray(grid.ind2xy(jnp.argmax(C)))  # (2,)

    paths = np.zeros((nPrd, nTime, 2))
    for w in range(nPrd):
        for t in range(t_min, nTime):
            paths[w, t] = np.asarray(field_argmax(t, w))
        paths[w, :t_min] = paths[w, t_min]
    return paths


def corr_wells(prior, prod_prior, dists_to_obs, t, well, nPrd, N=None,
               radius=None, sharpness=1.0, nan_mask=True):
    """Tapered parameter/production correlation field — the taper-tuning
    probe (reference HistoryMatch.py:738-748): corr(prior[:N],
    prod[:N, t, well]), optionally multiplied by the bump taper of given
    radius/sharpness with cells below taper 1e-3 masked to NaN.

    Returns an (Nxy,) field. `dists_to_obs` from `dist_to_obs` (obs tiled
    over time, well index fastest)."""
    from historymatching_tpu.utils import corr

    prior = jnp.asarray(prior)[:N]
    series = jnp.asarray(prod_prior)[:N, t, well]
    C = corr(prior, series)
    if radius is not None:
        c = bump(jnp.asarray(dists_to_obs)[:, well + nPrd * t] / radius, sharpness)
        C = C * c
        if nan_mask:
            C = jnp.where(c < 1e-3, jnp.nan, C)
    return C


def suggest_taper_radius(prior, prod_prior, dists_to_obs, nPrd, n_small=20,
                         radii=(0.4, 0.6, 0.8, 1.0, 1.2, 1.6, 2.0),
                         sharps=(0.1, 1.0, 10.0), times=None, wells=None):
    """Non-interactive version of the reference's taper-tuning methodology
    (HistoryMatch.py:763-769): find the (radius, sharpness) whose tapered
    SMALL-ensemble correlation fields best resemble the full-ensemble fields
    ("try to find a value that makes the localized (small-ensemble) fields
    resemble the full-size ensemble fields"; author's suggestion 0.8).

    Scores mean RMS difference between taper * corr(prior[:n_small], ...) and
    corr(prior, ...) over a probe set of (time, well) pairs. Returns
    (best_radius, best_sharpness, scores) with scores[(radius, sharp)] =
    float."""
    prod_prior = jnp.asarray(prod_prior)
    nTime = prod_prior.shape[1]
    if times is None:
        times = range(max(1, nTime // 4), nTime, max(1, nTime // 4))
    if wells is None:
        wells = range(nPrd)
    probes = [(t, w) for t in times for w in wells]

    def _finite(C):
        # Pre-breakthrough production series are constant across members
        # -> corr is 0/0 = NaN; such probes carry no signal, score as 0.
        return jnp.nan_to_num(C, nan=0.0, posinf=0.0, neginf=0.0)

    full = {tw: _finite(corr_wells(prior, prod_prior, dists_to_obs, *tw, nPrd))
            for tw in probes}
    scores = {}
    for radius in radii:
        for sharp in sharps:
            errs = []
            for tw in probes:
                small = _finite(corr_wells(prior, prod_prior, dists_to_obs, *tw,
                                           nPrd, N=n_small, radius=radius,
                                           sharpness=sharp, nan_mask=False))
                errs.append(float(jnp.sqrt(jnp.mean((small - full[tw]) ** 2))))
            scores[(radius, sharp)] = float(np.mean(errs))
    best = min(scores, key=scores.get)
    return best[0], best[1], scores


def domain_partition(grid, obs_inds, nTime=1, steps=(8, 8), radius=1.2, sharpness=1):
    """Domains + per-domain tapers for the batched local analysis
    (`da.update.ens_update0_loc_domains`).

    Splits the grid into rectangular domains (`steps` cells each; must divide
    the grid evenly so domains stack), computes each domain's
    centre-to-observation distances (obs tiled over `nTime` like
    `dist_to_obs`), and returns (domains, taper_dom): an
    (nDom, cells_per_domain) int array, and the (nDom, nObs*nTime) bump taper.
    """
    if grid.Nx % steps[0] or grid.Ny % steps[1]:
        raise ValueError(f"steps {steps} must divide the grid {grid.shape}")
    batches = rectangular_partitioning(grid.shape, list(steps))
    xy_obs = np.asarray(grid.ind2xy(np.asarray(obs_inds))).T
    xy_obs = np.tile(xy_obs, (nTime, 1))
    centres = []
    for b in batches:
        xy = np.asarray(grid.ind2xy(np.asarray(b))).T
        centres.append(xy.mean(0))
    dists = pairwise_distances(np.asarray(centres), xy_obs)
    taper_dom = bump(dists / radius, sharpness)
    domains = np.stack([np.asarray(b, np.int32) for b in batches])
    return domains, taper_dom


def rectangular_partitioning(shape, steps, do_ind=True):
    """Tile an N-D grid into rectangular domains of ~`steps` cells per axis.

    Host-side (static) domain generation for the batched local analysis
    (capability parity with reference tools/localization.py:95-145; the
    construction here is an outer sum of per-axis flat-index offsets).
    Returns a list of flat-index arrays, one per domain, covering every cell
    exactly once. With `do_ind=False` returns per-axis coordinate arrays
    instead.

    Derivation: a row-major flat index decomposes as sum_k i_k * stride_k,
    so a rectangular domain (the cartesian product of per-axis contiguous
    blocks) has flat indices equal to the broadcast sum of the per-axis
    `block * stride` offset vectors. When `steps` divides `shape` evenly
    (the only case `domain_partition` produces), the result is identical to
    the blocked reshape
    ``arange(prod(shape)).reshape(n0, s0, n1, s1, ...).transpose(evens +
    odds).reshape(nDom, -1)`` (tested). Uneven shapes split each axis into
    round(n/step) near-equal blocks.
    """
    assert len(shape) == len(steps)
    axis_blocks = [
        np.array_split(np.arange(n), max(1, round(n / s)))
        for n, s in zip(shape, steps)
    ]
    strides = np.concatenate([np.cumprod(shape[:0:-1])[::-1], [1]])
    domains = []
    for blocks in itertools.product(*axis_blocks):
        flat = np.zeros(1, dtype=np.intp)
        for blk, stride in zip(blocks, strides):
            flat = (flat[:, None] + blk[None, :] * stride).reshape(-1)
        domains.append(flat if do_ind else np.unravel_index(flat, shape))
    return domains
