"""The exact bench workload (64x64 grid, forward + ES-MDA), 8-way ensemble-
sharded on the virtual CPU mesh, must compile, execute, and match the
unsharded result (VERDICT round-1 item 4: close the 'projection only' gap as
far as this environment allows).

Small N (16 members) keeps CPU time sane; the *shapes that matter* — the
64x64 grid, the full pressure/transport pipeline, the (N, nTime*nPrd)
analysis, the shard_map-wrapped forward inside es_mda — are the bench's.
"""

import jax
import jax.numpy as jnp
import numpy as np

from historymatching_tpu.da.geostat import gaussian_fields_fft
from historymatching_tpu.da.update import es_mda, mda_alphas
from historymatching_tpu.parallel.mesh import ens_mesh, shard_ens
from historymatching_tpu.parallel.runner import forward_model
from historymatching_tpu.utils import temporal_R
from tests.test_sim import default_model

NTIME = 10
N = 16


def _bench_setup(key):
    model = default_model(Nx=64, Ny=64)
    k_truth, k_prior, k_noise, k_mda = jax.random.split(key, 4)
    truth = gaussian_fields_fft(k_truth, model.grid, N=1, r=0.8)[0]
    prior = gaussian_fields_fft(k_prior, model.grid, N=N, r=0.8)
    _, prod_truth = forward_model(model, truth[None], dt=0.025, nTime=NTIME)
    nPrd = prod_truth.shape[-1]
    _, R12 = temporal_R(NTIME, nPrd)
    R12 = jnp.asarray(R12, dtype=prior.dtype)
    noise = R12 @ jax.random.normal(k_noise, (NTIME * nPrd,), dtype=prior.dtype)
    obs = jnp.clip(prod_truth[0].reshape(-1) + noise, 0, 1)
    return model, prior, obs, R12, k_mda


def _fwd_obs(model, mesh_):
    def fn(E):
        _, prods = forward_model(
            model, E, dt=0.025, nTime=NTIME, keep_wsats=False, mesh=mesh_
        )
        return prods.reshape(prods.shape[0], -1)

    return fn


def test_bench_workload_sharded_matches_unsharded(key):
    model, prior, obs, R12, k_mda = _bench_setup(key)
    mesh = ens_mesh()  # all 8 virtual devices

    post_ref = es_mda(prior, _fwd_obs(model, None), obs, R12, mda_alphas(2), k_mda)
    post_sh = es_mda(
        shard_ens(prior, mesh), _fwd_obs(model, mesh), obs, R12, mda_alphas(2), k_mda
    )
    post_ref, post_sh = np.asarray(post_ref), np.asarray(post_sh)
    assert np.all(np.isfinite(post_sh))
    # f64 on CPU: the sharded program reorders reductions across devices only
    # in the analysis matmuls (GSPMD collectives) — tight tolerance holds.
    assert np.allclose(post_sh, post_ref, atol=1e-8), np.abs(post_sh - post_ref).max()


def test_bench_localized_sharded_matches_unsharded(key):
    """The domain-batched localized ES-MDA — lax.scan over domains with a
    scatter `.at[].set` onto the member-sharded ensemble (da/update.py
    `ens_update0_loc_domains`) — sharded over the 8-device mesh must match
    the unsharded run at the bench grid shape (round-3 VERDICT item 4a:
    scan + scatter under GSPMD is exactly the kind of program that silently
    re-shards)."""
    from historymatching_tpu.da.localization import domain_partition
    from historymatching_tpu.parallel.runner import prod_inds

    model, prior, obs, R12, k_mda = _bench_setup(key)
    mesh = ens_mesh()
    domains, taper_dom = domain_partition(
        model.grid, np.asarray(prod_inds(model)), nTime=NTIME,
        steps=(4, 4), radius=1.2,  # the bench's localized config
    )
    loc_kw = dict(domains=domains, taper_dom=jnp.asarray(taper_dom, prior.dtype))

    post_ref = es_mda(prior, _fwd_obs(model, None), obs, R12, mda_alphas(2),
                      k_mda, **loc_kw)
    post_sh = es_mda(shard_ens(prior, mesh), _fwd_obs(model, mesh), obs, R12,
                     mda_alphas(2), k_mda, **loc_kw)
    post_ref, post_sh = np.asarray(post_ref), np.asarray(post_sh)
    assert np.all(np.isfinite(post_sh))
    assert np.allclose(post_sh, post_ref, atol=1e-8), np.abs(post_sh - post_ref).max()


def test_robust_enopt_sharded_matches_unsharded(key):
    """Robust EnOpt with the uncertainty ensemble member-sharded over the
    mesh (round-5, mirrors the dryrun's enopt leg): the StoSAG gradient and
    the batched line search evaluate the objective over the sharded model
    ensemble — GSPMD partitions the paired forward simulations; the GD
    trajectory must match the unsharded run."""
    from historymatching_tpu.opt.enopt import GD, Backtracker, EnGrad
    from historymatching_tpu.opt.npv import NPVConfig, npv_value
    from historymatching_tpu.parallel.runner import set_perm

    model, prior, _, _, k_gd = _bench_setup(key)
    mesh = ens_mesh()
    cfg = NPVConfig(dt=0.025, nTime=NTIME, rate0=1.0)

    def make_obj(X):
        def obj_ux(u, x):
            m = set_perm(model.replace(inj_xy=u.reshape(1, 2)), x)
            return npv_value(m, cfg, wsat0=jnp.zeros(model.Nxy, prior.dtype))

        def obj_mean(u):
            return jax.vmap(obj_ux, in_axes=(None, 0))(u, X).mean()

        return obj_ux, obj_mean

    u0 = jnp.asarray([model.Lx / 2, model.Ly / 2], prior.dtype)
    ls = Backtracker(xSteps=(0.5, 0.25))  # 2 trials keep CPU time sane
    runs = {}
    for tag, X in (("ref", prior), ("sharded", shard_ens(prior, mesh))):
        obj_ux, obj_mean = make_obj(X)
        nabla = EnGrad(chol=0.05, nEns=N, robustly="StoSAG",
                       obj_ux=obj_ux, X=X)
        runs[tag] = GD(obj_mean, u0, nabla=nabla, line_search=ls,
                       nIter=1, key=k_gd)
    path_ref, objs_ref, _ = runs["ref"]
    path_sh, objs_sh, _ = runs["sharded"]
    assert np.all(np.isfinite(path_sh)) and np.all(np.isfinite(objs_sh))
    assert path_sh.shape == path_ref.shape
    assert np.allclose(path_sh, path_ref, atol=1e-8), (
        np.abs(path_sh - path_ref).max())
    assert np.allclose(objs_sh, objs_ref, atol=1e-8), (
        np.abs(objs_sh - objs_ref).max())


def test_ies_sharded_matches_unsharded(key):
    """IES with the forward model sharded over the mesh (round-3 VERDICT
    item 4b): the N x N weight-matrix Gauss-Newton iteration consumes a
    member-sharded observed ensemble each iteration; result must match the
    unsharded run."""
    from historymatching_tpu.da.update import decorrelator, ies
    from historymatching_tpu.utils import gaussian_noise

    model, prior, obs, R12, k_mda = _bench_setup(key)
    mesh = ens_mesh()
    p = obs.shape[0]
    perturbs = gaussian_noise(k_mda, N, p, L=R12)
    dec = decorrelator(R12)

    post_ref, _ = ies(prior, _fwd_obs(model, None), obs, perturbs, dec,
                      xStep=0.4, iMax=2)
    post_sh, _ = ies(shard_ens(prior, mesh), _fwd_obs(model, mesh), obs,
                     perturbs, dec, xStep=0.4, iMax=2)
    post_ref, post_sh = np.asarray(post_ref), np.asarray(post_sh)
    assert np.all(np.isfinite(post_sh))
    assert np.allclose(post_sh, post_ref, atol=1e-8), np.abs(post_sh - post_ref).max()
