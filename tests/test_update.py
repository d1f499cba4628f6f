"""DA update tests against the reference's analytic oracles (SURVEY.md §4):

- Gaussian-Gaussian case: x ~ N(0, 4/3 I_3), y|x ~ N(x, 4 I) => posterior
  N(y/4, I) (reference HistoryMatch.py:594-612).
- Localized update with identity taper on independent coords is still exact.
- All-ones taper reproduces the global ES exactly.
- IES with a linear observation operator reproduces the non-iterative ES;
  ILES likewise for the localized analysis.
- ES-MDA with alphas=[1] is exactly one ES step; MDA with 4 steps matches
  the analytic GG posterior statistically.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from historymatching_tpu.da.update import (
    decorrelator,
    ens_update0,
    ens_update0_loc,
    es_mda,
    ies,
    iles,
    iles_domains,
    mda_alphas,
)
from historymatching_tpu.utils import gaussian_noise


D = 3
NGG = 400  # reference uses 400 members for the GG bug check


@pytest.fixture()
def gg(key):
    k1, k2 = jax.random.split(key)
    E = jnp.sqrt(4 / 3) * jax.random.normal(k1, (NGG, D))
    return dict(
        prior_ens=E,
        obs=4.0 * jnp.ones(D),
        decorr=(1 / 2) * jnp.eye(D),
        perturbs=2.0 * jax.random.normal(k2, (NGG, D)),
    )


def _check_gg_posterior(post, atol_mean=0.25, atol_cov=0.35):
    post = np.asarray(post)
    mean = post.mean(0)
    cov = np.cov(post.T)
    assert np.allclose(mean, 1.0, atol=atol_mean), mean
    assert np.allclose(cov, np.eye(D), atol=atol_cov), cov


def test_es_gg_posterior(gg):
    post = ens_update0(**gg, obs_ens=gg["prior_ens"])
    _check_gg_posterior(post)


def test_les_identity_taper_gg(gg):
    post = ens_update0_loc(**gg, obs_ens=gg["prior_ens"], taper=jnp.eye(D))
    _check_gg_posterior(post)


def test_les_allones_taper_reproduces_global(gg):
    """Reference sanity check (HistoryMatch.py:817-822)."""
    global_post = ens_update0(**gg, obs_ens=gg["prior_ens"])
    ones = jnp.ones((D, D))
    local_post = ens_update0_loc(**gg, obs_ens=gg["prior_ens"], taper=ones)
    assert np.allclose(np.asarray(local_post), np.asarray(global_post), atol=1e-8)


def test_obs_space_and_ens_space_forms_agree(key):
    """p <= N and p > N paths of ens_update0 must agree (Woodbury identity)."""
    k1, k2, k3 = jax.random.split(key, 3)
    N, M = 30, 12
    prior = jax.random.normal(k1, (N, M))
    # p > N case
    p = 50
    H = jax.random.normal(k2, (M, p)) * 0.3
    obs_ens = prior @ H
    obs = jnp.ones(p)
    perturbs = jax.random.normal(k3, (N, p))
    decorr = jnp.eye(p)
    post_big = ens_update0(prior, obs_ens, obs, perturbs, decorr)
    # force obs-space path by manual computation with pinv (reference formula)
    from historymatching_tpu.utils import center

    X = np.asarray(center(prior)[0])
    Y = np.asarray(center(obs_ens)[0])
    S = Y @ np.asarray(decorr)
    Dm = np.asarray((obs - obs_ens - perturbs) @ decorr)
    C = S.T @ S + (N - 1) * np.eye(p)
    expect = np.asarray(prior) + Dm @ np.linalg.pinv(C) @ S.T @ X
    assert np.allclose(np.asarray(post_big), expect, atol=1e-8)


def test_les_matches_reference_subset_algorithm(key):
    """Masked full-width local analysis == ragged column-subset algorithm
    (the reference's local_analysis, HistoryMatch.py:784-793), verified
    against a direct NumPy implementation with a nontrivial taper."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    N, M, p = 25, 8, 12
    prior = jax.random.normal(k1, (N, M))
    obs_ens = prior @ jax.random.normal(k2, (M, p)) * 0.5
    obs = jax.random.normal(k3, (p,))
    perturbs = jax.random.normal(k4, (N, p))
    decorr = jnp.eye(p) * 0.7
    taper = np.abs(np.sin(np.arange(M)[:, None] * np.arange(p)[None, :] + 0.3))
    taper[taper < 0.3] = 0.0  # make some obs inactive

    got = np.asarray(ens_update0_loc(prior, obs_ens, obs, perturbs, decorr, taper))

    # direct reference algorithm
    from historymatching_tpu.utils import center

    X = np.asarray(center(prior)[0])
    S = np.asarray(center(obs_ens)[0] @ decorr)
    Dm = np.asarray((obs - obs_ens - perturbs) @ decorr)
    expect = np.array(np.asarray(prior))
    for i in range(M):
        ci = np.sqrt(taper[i])
        jj = ci > 1e-2
        if jj.any():
            Si = S[:, jj] * ci[jj]
            Di = Dm[:, jj] * ci[jj]
            Ci = Si.T @ Si + (N - 1) * np.eye(jj.sum())
            expect[:, i] += Di @ np.linalg.pinv(Ci) @ Si.T @ X[:, i]
    assert np.allclose(got, expect, atol=1e-8)


def test_ies_linear_reproduces_es(gg):
    """Reference bug check (HistoryMatch.py:947-951)."""
    es_post = ens_update0(**gg, obs_ens=gg["prior_ens"])
    ies_post, stats = ies(**gg, obs_ens=lambda x: x, xStep=1.0, iMax=4)
    assert np.allclose(np.asarray(ies_post), np.asarray(es_post), atol=1e-7)
    assert stats["E"].shape[0] == 4


def test_ies_forward_list_matches_single(gg):
    """`obs_ens` as a list of per-iteration callables (the solver-effort
    schedule hook) must bit-match the single-callable form when every entry
    is the same operator, and reject a wrong-length list."""
    import pytest

    fwd = lambda x: x
    single, _ = ies(**gg, obs_ens=fwd, xStep=0.6, iMax=3)
    listed, _ = ies(**gg, obs_ens=[fwd, fwd, fwd], xStep=0.6, iMax=3)
    assert np.array_equal(np.asarray(single), np.asarray(listed))
    with pytest.raises(ValueError):
        ies(**gg, obs_ens=[fwd, fwd], xStep=0.6, iMax=3)


def test_iles_linear_reproduces_les(gg):
    """Reference bug check (HistoryMatch.py:1067-1071)."""
    les_post = ens_update0_loc(**gg, obs_ens=gg["prior_ens"], taper=jnp.eye(D))
    iles_post, _ = iles(**gg, obs_ens=lambda x: x, taper=jnp.eye(D), xStep=1.0, iMax=4)
    assert np.allclose(np.asarray(iles_post), np.asarray(les_post), atol=1e-7)


def test_iles_domains_singleton_equals_iles(gg):
    """iles_domains with one cell per domain must reproduce per-cell iles."""
    domains = jnp.arange(D)[:, None]
    taper = jnp.eye(D)
    per_cell, _ = iles(**gg, obs_ens=lambda x: x, taper=taper, xStep=0.7, iMax=3)
    batched, _ = iles_domains(
        **gg, obs_ens=lambda x: x, taper_dom=taper, domains=domains,
        xStep=0.7, iMax=3,
    )
    assert np.allclose(np.asarray(batched), np.asarray(per_cell), atol=1e-9)


def test_iles_domains_grouped_equals_expanded_taper(key):
    """The local GN step depends only on the taper row (not the cell), so
    grouping equal-taper cells into a domain is exactly per-cell ILES with
    the expanded taper."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    N, M, p = 20, 6, 5
    nDom, kcell = 3, 2
    prior = jax.random.normal(k1, (N, M))
    H = 0.4 * jax.random.normal(k2, (M, p))
    obs = jax.random.normal(k3, (p,))
    perturbs = jax.random.normal(k4, (N, p))
    decorr = 0.8 * jnp.eye(p)
    taper_dom = jnp.abs(jnp.sin(jnp.arange(nDom)[:, None] + jnp.arange(p) * 0.7))
    domains = jnp.arange(M).reshape(nDom, kcell)
    taper_full = jnp.repeat(taper_dom, kcell, axis=0)  # cells in domain order

    per_cell, _ = iles(
        prior, lambda E: E @ H, obs, perturbs, decorr, taper_full,
        xStep=0.6, iMax=3,
    )
    batched, stats = iles_domains(
        prior, lambda E: E @ H, obs, perturbs, decorr, taper_dom, domains,
        xStep=0.6, iMax=3,
    )
    assert np.allclose(np.asarray(batched), np.asarray(per_cell), atol=1e-9)
    assert stats["E"].shape == (3, N, M)


def test_es_mda_single_alpha_equals_es(key):
    k1, k2 = jax.random.split(key)
    N, M = 200, D
    prior = jnp.sqrt(4 / 3) * jax.random.normal(k1, (N, M))
    obs = 4.0 * jnp.ones(M)
    R12 = 2.0 * jnp.eye(M)
    # replicate es_mda's internal key usage (noise drawn in float32 and
    # cast — the paired-seed parity contract)
    key2 = k2
    key2, sub = jax.random.split(key2)
    perturbs = gaussian_noise(sub, N, M, L=R12.astype(jnp.float32)).astype(R12.dtype)
    expect = ens_update0(prior, prior, obs, perturbs, decorrelator(R12))
    got = es_mda(prior, lambda E: E, obs, R12, jnp.array([1.0]), k2)
    assert np.allclose(np.asarray(got), np.asarray(expect), atol=1e-9)


def test_es_mda_gg_posterior(key):
    """4-step MDA on the linear GG case converges to the same posterior."""
    k1, k2 = jax.random.split(key)
    prior = jnp.sqrt(4 / 3) * jax.random.normal(k1, (NGG, D))
    obs = 4.0 * jnp.ones(D)
    R12 = 2.0 * jnp.eye(D)
    post = es_mda(prior, lambda E: E, obs, R12, mda_alphas(4), k2)
    _check_gg_posterior(post)


def test_es_mda_per_pass_operators(key):
    """`forward_obs` as a SEQUENCE of per-pass callables (the bench's
    per-MDA-pass solver-effort schedule): operators are consumed in pass
    order, a uniform list reproduces the scalar form exactly, and a wrong
    length is rejected."""
    k1, k2 = jax.random.split(key)
    prior = jnp.sqrt(4 / 3) * jax.random.normal(k1, (NGG, D))
    obs = 4.0 * jnp.ones(D)
    R12 = 2.0 * jnp.eye(D)
    alphas = mda_alphas(4)

    calls = []

    def make_fwd(tag):
        def fwd(E):
            calls.append(tag)
            return E
        return fwd

    sched = [make_fwd(i) for i in range(4)]
    post_sched = es_mda(prior, sched, obs, R12, alphas, k2)
    assert calls == [0, 1, 2, 3]
    post_uniform = es_mda(prior, lambda E: E, obs, R12, alphas, k2)
    assert np.allclose(np.asarray(post_sched), np.asarray(post_uniform))

    # a per-pass operator actually CHANGES the pass it runs in: bias pass 1
    biased = [lambda E: E + 0.5] + [lambda E: E] * 3
    post_biased = es_mda(prior, biased, obs, R12, alphas, k2)
    assert not np.allclose(np.asarray(post_biased), np.asarray(post_uniform))

    with pytest.raises(ValueError):
        es_mda(prior, sched[:3], obs, R12, alphas, k2)


def test_es_mda_localized(key):
    k1, k2 = jax.random.split(key)
    prior = jnp.sqrt(4 / 3) * jax.random.normal(k1, (NGG, D))
    obs = 4.0 * jnp.ones(D)
    R12 = 2.0 * jnp.eye(D)
    post = es_mda(prior, lambda E: E, obs, R12, mda_alphas(4), k2, taper=jnp.eye(D))
    _check_gg_posterior(post)


def test_loc_domains_equals_per_cell(key):
    """Domain-batched LES with singleton domains == per-cell LES; with shared
    per-domain tapers it equals per-cell LES using the broadcast taper."""
    from historymatching_tpu.da.update import ens_update0_loc_domains

    k1, k2, k3, k4 = jax.random.split(key, 4)
    N, M, p = 20, 12, 8
    prior = jax.random.normal(k1, (N, M))
    obs_ens = prior @ jax.random.normal(k2, (M, p)) * 0.5
    obs = jax.random.normal(k3, (p,))
    perturbs = jax.random.normal(k4, (N, p))
    decorr = jnp.eye(p)

    # singleton domains, arbitrary taper
    taper = np.abs(np.sin(np.arange(M)[:, None] + np.arange(p)[None, :]))
    taper[taper < 0.2] = 0.0
    domains = np.arange(M, dtype=np.int32).reshape(M, 1)
    got = ens_update0_loc_domains(prior, obs_ens, obs, perturbs, decorr, taper, domains)
    ref = ens_update0_loc(prior, obs_ens, obs, perturbs, decorr, taper)
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-9)

    # block domains with shared taper rows == per-cell with broadcast taper
    domains2 = np.arange(12, dtype=np.int32).reshape(3, 4)
    taper_dom = np.asarray(taper[[0, 4, 8]])
    got2 = ens_update0_loc_domains(prior, obs_ens, obs, perturbs, decorr, taper_dom, domains2)
    taper_bc = np.repeat(taper_dom, 4, axis=0)
    ref2 = ens_update0_loc(prior, obs_ens, obs, perturbs, decorr, taper_bc)
    assert np.allclose(np.asarray(got2), np.asarray(ref2), atol=1e-9)


def test_domain_partition_helper():
    from historymatching_tpu.da.localization import domain_partition
    from historymatching_tpu.grid import Grid2D

    g = Grid2D(Nx=16, Ny=16, Lx=2, Ly=1)
    obs_inds = np.array([17, 200])
    domains, taper_dom = domain_partition(g, obs_inds, nTime=3, steps=(4, 4), radius=1.2)
    allidx = np.sort(np.concatenate([np.asarray(d) for d in domains]))
    assert np.array_equal(allidx, np.arange(g.Nxy))
    assert np.asarray(taper_dom).shape == (len(domains), 6)
    assert np.asarray(taper_dom).max() <= 1.0


def test_loc_domains_obs_space_branch_matches_ens_space(key):
    """p < N picks the obs-space (p x p) solve; must equal the N x N form
    (push-through identity) and the per-cell localized update on grouped
    tapers."""
    from historymatching_tpu.da.update import ens_update0_loc_domains

    k1, k2, k3, k4 = jax.random.split(key, 4)
    N, M, p, nDom = 24, 8, 6, 4  # p < N -> obs-space branch
    prior = jax.random.normal(k1, (N, M))
    obs_ens = prior @ (0.4 * jax.random.normal(k2, (M, p)))
    obs = jax.random.normal(k3, (p,))
    perturbs = jax.random.normal(k4, (N, p))
    decorr = 0.8 * jnp.eye(p)
    taper_dom = jnp.abs(jnp.sin(jnp.arange(nDom)[:, None] + jnp.arange(p) * 0.9))
    domains = jnp.arange(M).reshape(nDom, 2)
    got = ens_update0_loc_domains(prior, obs_ens, obs, perturbs, decorr,
                                  taper_dom, domains)
    # reference: per-cell localized update with the expanded taper
    taper_full = jnp.repeat(taper_dom, 2, axis=0)
    expect = ens_update0_loc(prior, obs_ens, obs, perturbs, decorr, taper_full)
    assert np.allclose(np.asarray(got), np.asarray(expect), atol=1e-9)
