"""End-to-end history-matching slice (SURVEY.md §7 'minimum end-to-end slice'):

grid -> prior sampling -> truth + noisy obs -> ensemble forward -> ES /
localized ES / ES-MDA -> posterior closer to truth (in parameter RMSE) and to
the data (in production mismatch) than the prior.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from historymatching_tpu.da.geostat import gaussian_fields
from historymatching_tpu.da.localization import bump, dist_to_obs
from historymatching_tpu.da.update import (
    decorrelator,
    ens_update0,
    ens_update0_loc,
    es_mda,
    mda_alphas,
)
from historymatching_tpu.parallel.runner import forward_model, obs_ens_fn, prod_inds
from historymatching_tpu.utils import gaussian_noise, temporal_R, vect
from tests.test_sim import default_model


# The reference tutorial configuration (HistoryMatch.py:97,219-221,289):
# 20x20 grid, 40 steps, N=40. Smaller configs make the parameter-RMSE
# improvement statistically unreliable (cf. reference HistoryMatch.py:1095-1105).
NX = NY = 20
N_ENS = 40
NTIME = 40
DT = 0.025


@pytest.fixture(scope="module")
def case():
    key = jax.random.PRNGKey(1)
    m = default_model(Nx=NX, Ny=NY)
    k_truth, k_prior, k_noise, k_pert = jax.random.split(key, 4)
    truth = gaussian_fields(m.mesh, N=1, r=0.8, key=k_truth, grid=m.grid)[0]
    prior = gaussian_fields(m.mesh, N=N_ENS, r=0.8, key=k_prior, grid=m.grid)

    _, prod_truth = forward_model(m, truth[None], dt=DT, nTime=NTIME)
    prod_truth = prod_truth[0]  # (nTime, nPrd)
    nPrd = prod_truth.shape[1]

    R, R12 = temporal_R(NTIME, nPrd)
    noise = (R12 @ jax.random.normal(k_noise, (NTIME * nPrd,))).reshape(NTIME, nPrd)
    prod_noisy = jnp.clip(prod_truth + noise, 0, 1)

    _, prod_prior = forward_model(m, prior, dt=DT, nTime=NTIME)

    setup = dict(
        obs_ens=vect(prod_prior),
        obs=vect(prod_noisy),
        perturbs=gaussian_noise(k_pert, N_ENS, NTIME * nPrd, L=R12),
        decorr=decorrelator(R12),
    )
    return dict(
        model=m,
        truth=truth,
        prior=prior,
        prod_truth=prod_truth,
        prod_noisy=prod_noisy,
        prod_prior=prod_prior,
        R12=R12,
        setup=setup,
        key=key,
    )


def _rmse_vs_truth(ens, truth):
    return float(jnp.sqrt(jnp.mean((jnp.mean(ens, 0) - truth) ** 2)))


def test_es_beats_prior(case):
    post = ens_update0(case["prior"], **case["setup"])
    e_post = _rmse_vs_truth(post, case["truth"])
    e_prior = _rmse_vs_truth(case["prior"], case["truth"])
    assert e_post < e_prior, (e_post, e_prior)


def test_les_beats_prior(case):
    m = case["model"]
    pinds = np.asarray(prod_inds(m))
    dists = dist_to_obs(m.grid, pinds, nTime=NTIME)
    taper = bump(dists / 1.2)
    post = ens_update0_loc(case["prior"], **case["setup"], taper=taper)
    e_post = _rmse_vs_truth(post, case["truth"])
    e_prior = _rmse_vs_truth(case["prior"], case["truth"])
    assert e_post < e_prior, (e_post, e_prior)


def test_les_allones_taper_equals_global_on_real_problem(case):
    """Reference sanity check on the real problem (HistoryMatch.py:821-822)."""
    ones = jnp.ones((case["model"].Nxy, case["setup"]["obs"].shape[0]))
    post_loc = ens_update0_loc(case["prior"], **case["setup"], taper=ones)
    post_glob = ens_update0(case["prior"], **case["setup"])
    assert np.allclose(np.asarray(post_loc), np.asarray(post_glob), atol=1e-7)


def test_es0_data_space_inversion(case):
    """ES applied directly to the production forecasts (reference
    HistoryMatch.py:1156): posterior predictions match data better."""
    prod_post = ens_update0(vect(case["prod_prior"]), **case["setup"])
    obs = np.asarray(case["setup"]["obs"])
    err_prior = np.sqrt(np.mean((np.asarray(vect(case["prod_prior"])).mean(0) - obs) ** 2))
    err_post = np.sqrt(np.mean((np.asarray(prod_post).mean(0) - obs) ** 2))
    assert err_post < err_prior


def test_es_mda_beats_prior_and_es(case):
    m = case["model"]
    fwd = obs_ens_fn(m, dt=DT, nTime=NTIME)
    post_mda = es_mda(
        case["prior"], fwd, case["setup"]["obs"], case["R12"], mda_alphas(4), case["key"]
    )
    e_mda = _rmse_vs_truth(post_mda, case["truth"])
    e_prior = _rmse_vs_truth(case["prior"], case["truth"])
    assert e_mda < e_prior, (e_mda, e_prior)


def test_posterior_production_matches_data_better(case):
    """Re-run the ES posterior through the forward model: production mismatch
    vs the (noisy) data must shrink (reference HistoryMatch.py:1184-1196)."""
    m = case["model"]
    post = ens_update0(case["prior"], **case["setup"])
    _, prod_post = forward_model(m, post, dt=DT, nTime=NTIME)
    obs = np.asarray(case["prod_noisy"])
    err_prior = np.sqrt(np.mean((np.asarray(case["prod_prior"]).mean(0) - obs) ** 2))
    err_post = np.sqrt(np.mean((np.asarray(prod_post).mean(0) - obs) ** 2))
    assert err_post < err_prior, (err_post, err_prior)


def test_future_prediction_restart(case):
    """Prediction restart (reference HistoryMatch.py:1212-1227): resume each
    member from its own final saturation state."""
    m = case["model"]
    wsats, _ = forward_model(m, case["prior"][:4], dt=DT, nTime=4)
    curnt = wsats[:, -1, :]
    wsats2, prod2 = forward_model(m, case["prior"][:4], curnt, dt=DT, nTime=3)
    assert wsats2.shape == (4, 4, m.Nxy)
    assert np.allclose(np.asarray(wsats2[:, 0]), np.asarray(curnt))
