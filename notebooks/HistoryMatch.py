# -*- coding: utf-8 -*-
# ---
# jupyter:
#   jupytext:
#     formats: py:percent,ipynb
#     text_representation:
#       extension: .py
#       format_name: percent
#   kernelspec:
#     display_name: Python 3
#     language: python
#     name: python3
# ---

# %% [markdown]
# # History matching (ensemble data assimilation) — TPU-native tutorial
#
# This notebook mirrors the reference tutorial (`HistoryMatch.py` of
# patnr/HistoryMatching) on the `historymatching_tpu` stack: the same 2D
# two-phase reservoir case, truth + noisy observations, a geostatistical
# prior, and the full lineup of ensemble updates (ES, localized ES, IES,
# ILES, ES0 data-space inversion, ES-MDA), ending with restart-based future
# prediction.
#
# Differences from the reference worth knowing about up front:
#
# - The simulator is built in (JAX: one `lax.scan` over time; matrix-free
#   multigrid-PCG pressure; CFL-substepped upwind transport) instead of an
#   external pip package, and it is `jit`/`vmap`/`shard_map`-able.
# - The ensemble axis is a leading array axis in device memory. There is no
#   multiprocessing pool: `forward_model` is one compiled program.
# - Randomness uses explicit `jax.random` keys, not a global seed.
#
# The notebook runs on CPU or TPU alike; on CPU expect ~a minute.

# %%
import numpy as np
import jax
import jax.numpy as jnp

import historymatching_tpu as hm
from historymatching_tpu.da.localization import (
    corr_wells, dist_to_obs, suggest_taper_radius,
)
from historymatching_tpu.da.update import decorrelator
from historymatching_tpu.parallel.runner import obs_ens_fn, prod_inds
from historymatching_tpu import plotting

# %% [markdown]
# ## Case setup
#
# 20x20 grid on a 2x1 domain; 4 producers near the corners, 1 central
# injector, balanced rates (reference HistoryMatch.py:97,177-190). The model
# is an immutable pytree — `.replace(...)` reconfigures it functionally.

# %%
Lx, Ly = 2.0, 1.0
Nx = Ny = 20
near01 = np.array([0.12, 0.87])
prd_xy = [[x, y] for y in Ly * near01 for x in Lx * near01]
model = hm.ResSim.build(
    Nx=Nx, Ny=Ny, Lx=Lx, Ly=Ly,
    inj_xy=[[Lx / 2, Ly / 2]],
    prd_xy=prd_xy,
    inj_rates=[[1.0]],
    prd_rates=np.ones((4, 1)) / 4,
    name="HistoryMatch tutorial case",
).validate()

T, dt = 1.0, 0.025
nTime = round(T / dt)
N = 40  # ensemble size (reference :289)

key = jax.random.PRNGKey(1)
k_truth, k_prior, k_noise, k_pert, k_mda = jax.random.split(key, 5)

# %% [markdown]
# ## Prior and truth
#
# Pre-permeability fields are Gaussian random fields with range 0.8
# (reference :151-153); the truth is one extra draw of the same law. The
# permeability transform is `0.1 + exp(5 x)` (`perm_transf`).

# %%
truth = hm.sample_prior_perm(k_truth, model, N=1, r=0.8)[0]
prior = hm.sample_prior_perm(k_prior, model, N=N, r=0.8)
perm = {"Truth": truth[None], "Prior": prior}

fig, _ = plotting.fields(model, {"Truth": np.asarray(truth)}, "pperm", "Truth")

# %% [markdown]
# The prior's singular spectrum (reference :332-333) — computed with the
# device-safe Jacobi SVD (`hm.svals`), since this TPU backend has no LAPACK:

# %%
sv = np.asarray(hm.svals(prior))
plotting.spectrum(sv, "Prior spectrum")

# %% [markdown]
# ## Truth simulation and noisy observations
#
# Observations are water saturations at the producer cells at every time
# step, with temporally-correlated noise R = kron(toeplitz(exp(-t/2)), I)
# (reference :243-267).

# %%
wsat0 = jnp.zeros(model.Nxy)
wsats_t, prod_truth = hm.forward_model(model, truth[None], wsat0, dt, nTime)
prod_truth = prod_truth[0]
nPrd = model.nPrd
R, R12 = hm.utils.temporal_R(nTime, nPrd)
R12 = jnp.asarray(R12, dtype=prior.dtype)
noise = (R12 @ jax.random.normal(k_noise, (nTime * nPrd,),
                                 dtype=prior.dtype)).reshape(nTime, nPrd)
prod_noisy = jnp.clip(prod_truth + noise, 0, 1)

# %% [markdown]
# ## Prior ensemble forward run
#
# `forward_model` is the reference's `apply(comp1, ...)` process-pool
# fan-out replaced by one vmapped (and, across chips, `shard_map`-ed)
# compiled program.

# %%
wsats_prior, prod_prior = hm.forward_model(model, prior, wsat0, dt, nTime)
fig, _ = plotting.productions(
    {"Truth": prod_truth, "Noisy": prod_noisy, "Prior": prod_prior},
    "Past production",
)

# %% [markdown]
# ## ES update
#
# The stochastic ensemble smoother (reference `ens_update0`, :578-586) —
# same transposed-convention math, Cholesky/ensemble-space solves on the
# MXU instead of `pinv`.

# %%
setup = dict(
    obs_ens=hm.vect(prod_prior),
    obs=hm.vect(prod_noisy),
    perturbs=hm.gaussian_noise(k_pert, N, nTime * nPrd, L=R12),
    decorr=decorrelator(R12),
)
perm["ES"] = hm.ens_update0(prior, **setup)

# %% [markdown]
# ## Localization: taper tuning and the localized ES
#
# The reference's interactive `corr_wells` dashboard (:738-769) asks you to
# find the bump-taper radius that makes tapered small-ensemble correlation
# fields resemble the full-ensemble fields. `suggest_taper_radius` runs that
# comparison as a sweep:

# %%
pinds = np.asarray(prod_inds(model))
dists = dist_to_obs(model.grid, pinds, nTime=nTime)
best_r, best_s, scores = suggest_taper_radius(prior, prod_prior, dists, nPrd,
                                              n_small=N // 2)
print(f"suggested radius {best_r}, sharpness {best_s} "
      "(reference suggestion: 0.8; the run below uses 1.2 like the reference)")

cw = {
    "small ens, r=0.4": np.asarray(corr_wells(prior, prod_prior, dists,
                                              nTime - 1, 0, nPrd, N=N // 2,
                                              radius=0.4)),
    f"small ens, r={best_r}": np.asarray(corr_wells(prior, prod_prior, dists,
                                                    nTime - 1, 0, nPrd,
                                                    N=N // 2, radius=best_r)),
    "full ens": np.asarray(corr_wells(prior, prod_prior, dists,
                                      nTime - 1, 0, nPrd)),
}
fig, _ = plotting.fields(model, cw, "corr", "corr_wells (well 0, final time)")

# %%
taper = hm.bump(dists / 1.2)
perm["LES"] = hm.ens_update0_loc(prior, **setup, taper=taper)

# %% [markdown]
# ## Iterative smoothers: IES and ILES
#
# Subspace Gauss-Newton (Raanes et al. 2019; reference :906-944, 1007-1064).
# Each iteration re-runs the ensemble forward model. The localized ILES here
# is vmapped over cells; for big grids use `hm.iles_domains` (one weight
# matrix per domain).

# %%
fwd_obs = obs_ens_fn(model, dt, nTime)
no_obs_ens = {k: v for k, v in setup.items() if k != "obs_ens"}
perm["IES"], stats_ies = hm.ies(prior, fwd_obs, **no_obs_ens, xStep=0.4, iMax=10)
perm["ILES"], _ = hm.iles(prior, fwd_obs, **no_obs_ens, taper=taper,
                          xStep=0.4, iMax=10)

# %% [markdown]
# ## ES-MDA
#
# Multiple data assimilation (not in the reference; the BASELINE flagship
# method): iterate the ES with obs-error covariance inflated by alpha_i,
# sum(1/alpha_i) = 1.

# %%
perm["MDA"] = hm.es_mda(prior, fwd_obs, setup["obs"], R12, hm.mda_alphas(4), k_mda)

# %% [markdown]
# ## Diagnostics
#
# RMS error (vs truth) and deviation tables (reference `print_RMSMs`).

# %%
print("Accuracy wrt (supposedly unknown) parameter field")
hm.utils.print_RMSMs(perm, ref="Truth")

fig, _ = plotting.fields(
    model, {k: np.atleast_2d(np.asarray(v)).mean(0) for k, v in perm.items()},
    "pperm", "Posterior means",
)

# %% [markdown]
# ## Data mismatch and ES0 (data-space inversion)
#
# Re-run the posterior ensembles through the forward model; additionally,
# `ens_update0` applied directly to the production ensemble gives posterior
# *predictions* with zero extra simulations (reference :1149-1156).

# %%
prod = {"Truth": prod_truth, "Noisy": prod_noisy, "Prior": prod_prior}
wsat_cur = {"Truth": wsats_t[0, -1], "Prior": wsats_prior[:, -1]}
for methd in ["ES", "LES", "IES", "ILES", "MDA"]:
    w, p = hm.forward_model(model, perm[methd], wsat0, dt, nTime)
    prod[methd] = p
    wsat_cur[methd] = w[:, -1]
prod["ES0"] = hm.vect(hm.ens_update0(hm.vect(prod_prior), **setup), nTime, undo=True)

print("Accuracy wrt past production (vs noisy obs)")
hm.utils.print_RMSMs(prod, ref="Noisy")

# %% [markdown]
# ## Prediction: restart into the future
#
# The simulator restarts from any saturation state (reference :1212-1231):
# continue each posterior member from its final state.

# %%
nFutr = 20
futr = {}
w, p = hm.forward_model(model, truth[None], wsat_cur["Truth"][None], dt, nFutr)
futr["Truth"] = p[0]
for methd in ["Prior", "ES", "LES", "IES", "ILES", "MDA"]:
    _, p = hm.forward_model(model, perm[methd], wsat_cur[methd], dt, nFutr)
    futr[methd] = p
print("Accuracy wrt future production (vs truth)")
hm.utils.print_RMSMs(futr, ref="Truth")

# %% [markdown]
# ## Where to go next
#
# - `Optimise.ipynb` — EnOpt production optimisation on the same stack.
# - `examples/history_match.py` — this flow as a CLI script (with `--small`,
#   `--plot`, multi-seed options).
# - Scaling: pass `mesh=hm.ens_mesh(n)` to `forward_model` to shard members
#   across TPU chips; `bench.py` runs the N=1000 / 64x64 flagship workload.
