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
# # Production optimisation (EnOpt) — TPU-native tutorial
#
# Mirrors the reference `Optimise.py` notebook (patnr/HistoryMatching) on
# the `historymatching_tpu` stack: the NPV objective with full economic
# accounting, ensemble gradients (`EnGrad` = the reference's `nabla_ens`),
# backtracking line search (batched — all trial steps evaluated at once),
# and the case lineup: injector placement, multi-rate, time-dependent
# rates, robust optimisation under permeability uncertainty, and a Pareto
# sweep.
#
# Invalid configurations (unbalanced rates, out-of-domain wells) yield
# NPV = 0 via validity *flags* — the jit-safe equivalent of the reference's
# exception-as-penalty try/except.

# %%
import numpy as np
import jax
import jax.numpy as jnp

import historymatching_tpu as hm
from historymatching_tpu.opt.npv import npv_value
from historymatching_tpu.opt.transforms import (
    balance_rates, coordinate_transform, equalize, rate_transform,
)
from historymatching_tpu.utils import mesh2list, pCircle
from historymatching_tpu import plotting

# %% [markdown]
# ## Base model
#
# Like the history-matching case, but with a fixed heterogeneous
# permeability field (reference Optimise.py:64-89).

# %%
Lx, Ly = 2.0, 1.0
Nx = Ny = 20
rate0 = 1.5
near01 = np.array([0.12, 0.87])
xy_4corners = [[x, y] for y in Ly * near01 for x in Lx * near01]

key = jax.random.PRNGKey(23)
k_perm, key = jax.random.split(key)
base = hm.ResSim.build(Nx=Nx, Ny=Ny, Lx=Lx, Ly=Ly, name="Base model")
perm_field = hm.sample_prior_perm(k_perm, base, N=1, r=0.8)[0]
K = (0.1 + jnp.exp(5 * perm_field)).reshape(base.shape)
base = base.replace(
    K=jnp.stack([K, K]),
    inj_xy=[[Lx / 2, Ly / 2]],
    prd_xy=xy_4corners,
    inj_rates=rate0 * np.ones((1, 1)),
    prd_rates=rate0 * np.ones((4, 1)) / 4,
).validate()

nTime = 40
cfg = hm.NPVConfig(dt=0.025, nTime=nTime, rate0=rate0)
nIter = 30

fig, _ = plotting.fields(base, {"K": np.log10(np.asarray(K)).ravel()}, "pperm",
                         "log10 permeability")

# %% [markdown]
# ## Case: injector placement, with exhaustive-search verification
#
# The full NPV landscape over every cell centre is cheap on TPU
# (`jax.lax.map` over the grid), so EnOpt's answer is checked against the
# global optimum (reference :431-468).

# %%
obj = lambda u: npv_value(base, cfg, inj_xy=u.reshape(1, 2))
pts = mesh2list(*base.mesh)
npvs = jax.lax.map(jax.vmap(obj), pts.reshape(-1, Ny, 2)).reshape(-1)
amax = int(jnp.argmax(npvs))
xy_best = np.asarray(base.ind2xy(amax))
print(f"exhaustive optimum {float(npvs[amax]):.4f} at {xy_best.round(2)}")

key, k = jax.random.split(key)
u0 = jax.random.uniform(k, (2,)) * jnp.array([Lx, Ly])
path, objs, info = hm.GD(obj, u0, nabla=hm.EnGrad(chol=0.1), nIter=nIter, key=k)
print(f"EnOpt: NPV {objs[0]:.3f} -> {objs[-1]:.3f}, u* = {path[-1].round(2)}")

fig, _ = plotting.fields(base, {"NPV": np.asarray(npvs)}, "NPV",
                         "NPV landscape (injector xy)")

# %% [markdown]
# ## Case: multiple rates (manual grid sweep vs EnOpt)
#
# The reference's interactive dashboard ("were you able to beat EnOpt?",
# :676-733) becomes a coarse grid sweep playing the human.

# %%
triangle = [0, 135, -135]
m4 = base.replace(
    name="Triangle case",
    inj_xy=[[Lx / 2, Ly / 2]] + [pCircle(th + 90, Lx, Ly) for th in triangle],
    prd_xy=[pCircle(th - 90, Lx, Ly) for th in triangle],
    inj_rates=rate0 * np.ones((4, 1)) / 4,
    prd_rates=rate0 * np.ones((3, 1)) / 3,
)

def obj_mr(u):
    inj = u.reshape(-1, 1)
    return npv_value(m4, cfg, inj_rates=inj, prd_rates=equalize(inj, m4.nPrd))

g1 = np.linspace(0.1, 1.4, 5)
U = np.stack(np.meshgrid(*[g1] * 4, indexing="ij"), -1).reshape(-1, 4)
vals = np.asarray(jax.lax.map(jax.vmap(obj_mr),
                              jnp.asarray(U).reshape(-1, 5, 4))).reshape(-1)
print(f"manual grid best {vals.max():.3f} at rates {U[vals.argmax()].round(2)}")

key, k = jax.random.split(key)
path, objs, _ = hm.GD(obj_mr, 0.7 * jnp.ones(m4.nInj),
                      nabla=hm.EnGrad(chol=0.1), nIter=nIter, key=k)
print(f"EnOpt: {objs[-1]:.3f} at rates {path[-1].round(2)}")

# %% [markdown]
# ## Case: time-dependent rates
#
# Piecewise-constant rates over `nInterval` windows, exp-transformed with a
# snap-to-zero floor, inj/prd balanced (reference :732-777).

# %%
nInterval = 10

def obj_tr(u):
    split_at = nInterval * m4.nInj
    inj = rate_transform(u[:split_at], m4.nInj, nInterval, nTime)
    prd = rate_transform(u[split_at:], m4.nPrd, nInterval, nTime)
    inj, prd = balance_rates(inj, prd)
    return npv_value(m4, cfg, inj_rates=inj, prd_rates=prd)

key, k1, k2 = jax.random.split(key, 3)
u0 = -1.4 + 1e-2 * jax.random.normal(k1, ((m4.nInj + m4.nPrd) * nInterval,))
path, objs, _ = hm.GD(obj_tr, u0, nabla=hm.EnGrad(chol=0.6, nEns=20),
                      nIter=nIter, key=k2)
print(f"time-dependent rates: NPV {objs[0]:.3f} -> {objs[-1]:.3f}")

# %% [markdown]
# ## Robust optimisation under geological uncertainty
#
# Objective = mean NPV over an uncertainty ensemble of permeability fields;
# gradients via `EnGrad(robustly=...)`: "StoSAG" (2N sims/gradient),
# "Paired", "Mean-model" (reference :809-950). Afterwards: per-member
# exhaustive verification (the reference's RMS-suboptimality count,
# :963-997) and the KDE performance-density comparison (:1009-1066).

# %%
nEns = 31
key, k_uq, k_u0, k_gd = jax.random.split(key, 4)
uq_ens = 0.1 + jnp.exp(5 * hm.sample_prior_perm(k_uq, base, N=nEns, r=0.8))

def obj1(u, x):
    Kx = x.reshape(base.shape)
    return npv_value(base, cfg, inj_xy=u.reshape(1, 2), K=jnp.stack([Kx, Kx]))

def obj_robust(u):
    return jnp.mean(jax.vmap(lambda x: obj1(u, x))(uq_ens))

u0 = jax.random.uniform(k_u0, (2,)) * jnp.array([Lx, Ly])
ng = hm.EnGrad(chol=0.1, nEns=nEns, robustly="StoSAG", obj_ux=obj1, X=uq_ens)
path, objs, _ = hm.GD(obj_robust, u0, nabla=ng, nIter=nIter, key=k_gd)
ctrl_robust = path[-1]
print(f"robust (StoSAG): NPV {objs[0]:.3f} -> {objs[-1]:.3f}, u* = {ctrl_robust.round(2)}")

# %%
# Per-member nominal EnOpt optima vs per-member global (exhaustive) optima.
ctrl_nominal = []
for n in range(nEns):
    key, kn, ku = jax.random.split(key, 3)
    u0n = jax.random.uniform(ku, (2,)) * jnp.array([Lx, Ly])
    pth, _, _ = hm.GD(lambda u, x=uq_ens[n]: obj1(u, x), u0n,
                      nabla=hm.EnGrad(chol=0.1), nIter=nIter, key=kn)
    ctrl_nominal.append(np.asarray(pth[-1]))
ctrl_nominal = np.asarray(ctrl_nominal)

def member_landscape(x):
    return jax.lax.map(jax.vmap(lambda u, x=x: obj1(u, x)),
                       pts.reshape(-1, Ny, 2)).reshape(-1)

npv_mesh = jnp.stack([member_landscape(x) for x in uq_ens])
ctrl_global = np.stack(
    np.asarray(base.ind2xy(np.asarray(jnp.argmax(npv_mesh, axis=1)))), -1)
err = (ctrl_global - ctrl_nominal) / np.array([Lx, Ly])
RMS = np.sqrt(np.mean(err**2, -1))
print(f"Number of significantly suboptimal EnOpt answer: "
      f"{int((RMS > 0.1).sum())} of {len(RMS)}")

# %%
# KDE performance densities: each nominal control vs the robust one.
npvs_robust = np.asarray(jax.vmap(lambda x: obj1(jnp.asarray(ctrl_robust), x))(uq_ens))
npvs_condnl = np.asarray(
    jax.vmap(lambda u: jax.vmap(lambda x: obj1(u, x))(uq_ens))(jnp.asarray(ctrl_nominal)))
fig = plotting.npv_kde(npvs_condnl, npvs_robust)

# %% [markdown]
# ## Multi-objective: Pareto front over injection price
#
# Sweep the injection-cost multiplier, optimise the rate for each, and
# trace sales vs emissions (reference :1069-1139, the "Angga2022" 5-spot).

# %%
m5 = base.replace(
    name="Angga2022-5spot",
    prd_xy=[[Lx / 2, Ly / 2]],
    inj_xy=xy_4corners,
    prd_rates=rate0 * np.ones((1, 1)),
    inj_rates=rate0 * np.ones((4, 1)) / 4,
)
sales, emissions = [], []
for xCost in np.arange(0.1, 1.0, 0.2):
    cfg_x = cfg.replace(price_inj=20.0 * float(xCost))

    def obj_p(r, cfg_x=cfg_x):
        prd = r.reshape(1, 1)
        inj = equalize(prd, m5.nInj)
        return npv_value(m5, cfg_x, prd_rates=prd, inj_rates=inj)

    key, k = jax.random.split(key)
    path, objs, _ = hm.GD(obj_p, jnp.array([2.0]), nabla=hm.EnGrad(chol=0.1),
                          nIter=nIter, key=k)
    r_opt = path[-1].reshape(1, 1)
    _, other = hm.npv(m5, cfg_x, prd_rates=r_opt,
                      inj_rates=np.asarray(equalize(jnp.asarray(r_opt), m5.nInj)))
    led = other["ledgr"]
    sales.append(float(led["oil"]))
    emissions.append(-(float(led["inj"]) + float(led["wat"])))
print("sales:", np.round(sales, 2))
print("emissions:", np.round(emissions, 2))
