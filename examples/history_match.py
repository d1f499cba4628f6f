"""End-to-end history-matching tutorial workflow.

Reproduces the complete flow of the reference's `notebooks/HistoryMatch.py`
(case setup, truth + noisy obs synthesis, prior sampling, correlation study,
ES / localized ES / IES / ILES / ES0 / ES-MDA updates, diagnostics, and
restart-based future prediction) as a runnable script on the TPU-native
stack. Figures are written to --outdir when --plot is given.

Run:  python examples/history_match.py [--small] [--plot] [--f64]
"""

from __future__ import annotations

import argparse
import os
import time

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true", help="small/fast configuration")
    ap.add_argument("--plot", action="store_true", help="write figures to --outdir")
    ap.add_argument("--outdir", default="figs")
    ap.add_argument("--f64", action="store_true", help="float64 (CPU parity mode)")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--seed", type=int, default=1)
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import historymatching_tpu as hm
    from historymatching_tpu.da.localization import dist_to_obs
    from historymatching_tpu.da.update import decorrelator
    from historymatching_tpu.parallel.runner import obs_ens_fn, prod_inds

    # ---- Case setup (reference HistoryMatch.py:97,177-190) -----------------
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
    N = 20 if args.small else 40
    if args.small:
        nTime = 20

    key = jax.random.PRNGKey(args.seed)
    k_truth, k_prior, k_noise, k_pert, k_mda = jax.random.split(key, 5)

    # ---- Truth + prior (same law; reference HistoryMatch.py:151-167,289) ---
    truth = hm.sample_prior_perm(k_truth, model, N=1, r=0.8)[0]
    prior = hm.sample_prior_perm(k_prior, model, N=N, r=0.8)
    perm = {"Truth": truth[None], "Prior": prior}

    # ---- Truth simulation + noisy obs (reference :219-267) ------------------
    wsat0 = jnp.zeros(model.Nxy)
    t0 = time.time()
    wsats_t, prod_truth = hm.forward_model(model, truth[None], wsat0, dt, nTime)
    prod_truth = prod_truth[0]
    nPrd = model.nPrd
    R, R12 = hm.utils.temporal_R(nTime, nPrd)
    R12 = jnp.asarray(R12, dtype=prior.dtype)
    noise = (R12 @ jax.random.normal(k_noise, (nTime * nPrd,), dtype=prior.dtype)).reshape(
        nTime, nPrd
    )
    prod_noisy = jnp.clip(prod_truth + noise, 0, 1)

    # ---- Prior ensemble forward run (reference :400-401) -------------------
    wsats_prior, prod_prior = hm.forward_model(model, prior, wsat0, dt, nTime)
    print(f"forward runs ({N + 1} sims x {nTime} steps): {time.time() - t0:.2f}s")

    # ---- Common update arguments (reference hm_setup0, :635-640) -----------
    setup = dict(
        obs_ens=hm.vect(prod_prior),
        obs=hm.vect(prod_noisy),
        perturbs=hm.gaussian_noise(k_pert, N, nTime * nPrd, L=R12),
        decorr=decorrelator(R12),
    )

    # ---- ES (reference :652) ------------------------------------------------
    perm["ES"] = hm.ens_update0(prior, **setup)

    # ---- Localized ES (reference :863, radius 1.2 bump taper) ---------------
    pinds = np.asarray(prod_inds(model))
    dists = dist_to_obs(model.grid, pinds, nTime=nTime)
    taper = hm.bump(dists / 1.2)
    perm["LES"] = hm.ens_update0_loc(prior, **setup, taper=taper)

    # ---- IES / ILES (reference :961,1075; xStep=0.4, iMax=10) --------------
    fwd_obs = obs_ens_fn(model, dt, nTime)
    iMax = 3 if args.small else 10
    t0 = time.time()
    perm["IES"], stats_ies = hm.ies(prior, fwd_obs, **{k: v for k, v in setup.items() if k != "obs_ens"}, xStep=0.4, iMax=iMax)
    print(f"IES ({iMax} iters): {time.time() - t0:.2f}s")
    t0 = time.time()
    perm["ILES"], _ = hm.iles(
        prior, fwd_obs, **{k: v for k, v in setup.items() if k != "obs_ens"},
        taper=taper, xStep=0.4, iMax=iMax,
    )
    print(f"ILES ({iMax} iters): {time.time() - t0:.2f}s")

    # ---- ES-MDA (BASELINE.md first-class addition) ---------------------------
    perm["MDA"] = hm.es_mda(prior, fwd_obs, setup["obs"], R12, hm.mda_alphas(4), k_mda)

    # ---- Diagnostics wrt truth (reference :1114-1115) ------------------------
    print("\nAccuracy wrt (supposedly unknown) parameter field")
    hm.utils.print_RMSMs(perm, ref="Truth")

    # ---- Data mismatch: re-run posteriors (reference :1142-1145) -------------
    prod = {"Truth": prod_truth, "Noisy": prod_noisy, "Prior": prod_prior}
    wsat_cur = {"Truth": wsats_t[0, -1], "Prior": wsats_prior[:, -1]}
    for methd in ["ES", "LES", "IES", "ILES", "MDA"]:
        w, p = hm.forward_model(model, perm[methd], wsat0, dt, nTime)
        prod[methd] = p
        wsat_cur[methd] = w[:, -1]

    # ---- ES0: data-space inversion (reference :1156) --------------------------
    prod["ES0"] = hm.vect(hm.ens_update0(hm.vect(prod_prior), **setup), nTime, undo=True)

    print("\nAccuracy wrt past production (vs noisy obs)")
    hm.utils.print_RMSMs(prod, ref="Noisy")

    # ---- Future prediction via restart (reference :1212-1231) ----------------
    nFutr = 10 if args.small else 20
    futr = {}
    w, p = hm.forward_model(model, truth[None], wsat_cur["Truth"][None], dt, nFutr)
    futr["Truth"] = p[0]
    for methd in ["Prior", "ES", "LES", "IES", "ILES", "MDA"]:
        _, p = hm.forward_model(model, perm[methd], wsat_cur[methd], dt, nFutr)
        futr[methd] = p
    print("\nAccuracy wrt future production (vs truth)")
    hm.utils.print_RMSMs(futr, ref="Truth")

    # ---- Correlation study (reference :478-494, non-interactive) -------------
    i_mid = model.xy2ind(Lx / 2 + 0.3, Ly / 2)
    C = hm.corr(prior, wsats_prior[:, -1, i_mid])
    print(f"\ncorr(pre-perm, final sat @ probe cell): range [{float(C.min()):.2f}, "
          f"{float(C.max()):.2f}]")

    # ---- Taper tuning: corr_wells sweep (reference :738-769, headless) -------
    # The reference's interactive probe asks you to find the radius that makes
    # the tapered small-ensemble correlation fields resemble the full-ensemble
    # fields (author's suggested answer: 0.8). This sweep scores that
    # resemblance over a (radius, sharpness) grid and prints the winner.
    from historymatching_tpu.da.localization import suggest_taper_radius

    best_r, best_s, scores = suggest_taper_radius(
        prior, prod_prior, dists, nPrd, n_small=max(4, N // 2),
    )
    print(f"taper tuning (corr_wells sweep): suggested radius {best_r} "
          f"sharpness {best_s} (reference suggestion: 0.8; run uses 1.2)")
    sweep_tbl = sorted(scores.items(), key=lambda kv: kv[1])[:5]
    for (r, s), v in sweep_tbl:
        print(f"  radius {r:<4} sharp {s:<4}: score {v:.4f}")
    # Prior singular spectrum (reference :332-333), device-safe Jacobi SVD.
    sv = np.asarray(hm.svals(prior))
    print(f"prior spectrum: s[0]={sv[0]:.2f}, s[-1]={sv[-1]:.3f}, "
          f"s[0]/s[-1]={sv[0] / max(sv[-1], 1e-12):.1f}")

    if args.plot:
        os.makedirs(args.outdir, exist_ok=True)
        from historymatching_tpu import plotting

        means = {k: np.atleast_2d(np.asarray(v)).mean(0) for k, v in perm.items()}
        fig, _ = plotting.fields(model, means, "pperm", "Posterior means")
        fig.savefig(os.path.join(args.outdir, "perm_means.png"), dpi=120)
        fig, _ = plotting.productions(prod, "Past production")
        fig.savefig(os.path.join(args.outdir, "productions.png"), dpi=120)
        fig, _ = plotting.fields(model, {"corr": np.asarray(C)}, "corr", "Correlation probe")
        fig.savefig(os.path.join(args.outdir, "correlation.png"), dpi=120)
        from historymatching_tpu.da.localization import corr_wells

        cw = {
            f"r={r}": np.asarray(
                corr_wells(prior, prod_prior, dists, nTime - 1, 0, nPrd,
                           N=max(4, N // 2), radius=r)
            )
            for r in (0.4, best_r, 2.0)
        }
        cw["full ens"] = np.asarray(
            corr_wells(prior, prod_prior, dists, nTime - 1, 0, nPrd)
        )
        fig, _ = plotting.fields(model, cw, "corr", "corr_wells taper tuning (well 0)")
        fig.savefig(os.path.join(args.outdir, "corr_wells.png"), dpi=120)
        print(f"figures written to {args.outdir}/")


if __name__ == "__main__":
    main()
