"""Production-optimisation (EnOpt) tutorial workflow.

Reproduces the case lineup of the reference's `notebooks/Optimise.py` on the
TPU-native stack: NPV objective + exhaustive-search verification, injector
placement (x,y), x-only placement, two injectors with coordinate transform,
single/multi rates, time-dependent rates, robust optimisation
(Paired/StoSAG/Mean-model/naive) under permeability uncertainty, and the
multi-objective (Pareto) sweep over injection price.

Run:  python examples/optimise.py [--small] [--cpu] [--cases inj_xy,rates,...]
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
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument(
        "--cases",
        default="inj_xy,x_only,two_inj,rate,multi_rate,time_rates,robust,pareto,toys",
    )
    ap.add_argument("--seed", type=int, default=23)
    ap.add_argument("--plot", action="store_true", help="write figures to --outdir")
    ap.add_argument("--outdir", default="figs")
    args = ap.parse_args()
    cases = set(args.cases.split(","))

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import historymatching_tpu as hm
    from historymatching_tpu.opt.npv import npv_value
    from historymatching_tpu.opt.transforms import (
        coordinate_transform,
        equalize,
        balance_rates,
        rate_transform,
    )
    from historymatching_tpu.utils import mesh2list, pCircle

    # ---- Base model (reference Optimise.py:64-89) ---------------------------
    Lx, Ly = 2.0, 1.0
    Nx = Ny = 20 if not args.small else 12
    rate0 = 1.5
    near01 = np.array([0.12, 0.87])
    xy_4corners = [[x, y] for y in Ly * near01 for x in Lx * near01]

    key = jax.random.PRNGKey(args.seed)
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

    nTime = 20 if args.small else 40
    cfg = hm.NPVConfig(dt=0.025, nTime=nTime, rate0=rate0)
    nIter = 10 if args.small else 30

    def report(name, objs, extra=""):
        print(f"[{name}] NPV {objs[0]:.3f} -> {objs[-1]:.3f} in {len(objs) - 1} steps {extra}")

    # ---- Case: injector (x, y) + exhaustive search (reference :431-468) -----
    if "inj_xy" in cases:
        obj = lambda u: npv_value(base, cfg, inj_xy=u.reshape(1, 2))
        t0 = time.time()
        pts = mesh2list(*base.mesh)
        npvs = jax.lax.map(jax.vmap(obj), pts.reshape(-1, Ny, 2)).reshape(-1)
        amax = int(jnp.argmax(npvs))
        xy_best = np.asarray(base.ind2xy(amax))
        print(f"[inj_xy] exhaustive optimum {float(npvs[amax]):.4f} at "
              f"(x={xy_best[0]:.2f}, y={xy_best[1]:.2f}) [{time.time() - t0:.1f}s]")
        key, k = jax.random.split(key)
        u0 = jax.random.uniform(k, (2,)) * jnp.array([Lx, Ly])
        path, objs, info = hm.GD(obj, u0, nabla=hm.EnGrad(chol=0.1), nIter=nIter, key=k)
        report("inj_xy EnOpt", objs, f"final u={path[-1].round(2)} ({info['cause']})")

    # ---- Case: x-coordinate only (reference :495-527) ------------------------
    if "x_only" in cases:
        y_fix = Ly / 2

        def obj_x(xs):
            xy = jnp.stack([xs[0], jnp.asarray(y_fix)]).reshape(1, 2)
            return npv_value(base, cfg, inj_xy=xy)

        key, k = jax.random.split(key)
        path, objs, info = hm.GD(obj_x, jnp.array([0.1 * Lx]),
                                 nabla=hm.EnGrad(chol=0.3), nIter=nIter, key=k)
        report("x_only EnOpt", objs, f"x*={float(path[-1][0]):.2f}")

    # ---- Case: 2 injectors, coordinate transform (reference :541-626) --------
    if "two_inj" in cases:
        m2 = base.replace(
            name="Lower 2 corners",
            prd_xy=xy_4corners[:2],
            prd_rates=rate0 * np.ones((2, 1)) / 2,
            inj_rates=rate0 * np.ones((2, 1)) / 2,
            inj_xy=coordinate_transform(np.array([-1.0, 0, 1.0, 0]), Lx, Ly).reshape(2, 2),
        )

        def obj2(u):
            xy = coordinate_transform(u, Lx, Ly).reshape(2, 2)
            return npv_value(m2, cfg, inj_xy=xy)

        key, k = jax.random.split(key)
        path, objs, info = hm.GD(obj2, jnp.array([-1.0, 0, 1.0, 0]),
                                 nabla=hm.EnGrad(chol=0.1), nIter=nIter, key=k)
        xy_fin = np.asarray(coordinate_transform(path[-1], Lx, Ly)).round(2)
        report("two_inj EnOpt", objs, f"inj_xy*={xy_fin}")

    # ---- Case: single rate (reference :637-673) -------------------------------
    if "rate" in cases:

        def obj_r(r):
            inj = r.reshape(1, 1)
            prd = equalize(inj, base.nPrd)
            return npv_value(base, cfg, inj_rates=inj, prd_rates=prd)

        key, k = jax.random.split(key)
        path, objs, info = hm.GD(obj_r, jnp.array([0.3]),
                                 nabla=hm.EnGrad(chol=0.1), nIter=nIter, key=k)
        report("rate EnOpt", objs, f"rate*={float(path[-1][0]):.2f}")

    # ---- Case: multiple rates, manual + EnOpt (reference :676-733) ------------
    # The reference's `interactive_rate_optim` lets you hand-tune 4 injector
    # rates against EnOpt ("Were you able to beat EnOpt?"). Headless stand-in:
    # a coarse grid sweep over the 4 rates plays the human.
    if "multi_rate" in cases:
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
            prd = equalize(inj, m4.nPrd)
            return npv_value(m4, cfg, inj_rates=inj, prd_rates=prd)

        n1d = 3 if args.small else 5
        g1 = np.linspace(0.1, 1.4, n1d)
        U = np.stack(np.meshgrid(*[g1] * 4, indexing="ij"), -1).reshape(-1, 4)
        t0 = time.time()
        vals = jax.lax.map(jax.vmap(obj_mr), jnp.asarray(U).reshape(-1, n1d, 4))
        vals = np.asarray(vals).reshape(-1)
        i_best = int(vals.argmax())
        print(f"[multi_rate] manual (grid {n1d}^4) best NPV {vals[i_best]:.3f} at "
              f"rates {U[i_best].round(2)} [{time.time() - t0:.1f}s]")
        key, k = jax.random.split(key)
        path, objs, info = hm.GD(obj_mr, 0.7 * jnp.ones(m4.nInj),
                                 nabla=hm.EnGrad(chol=0.1), nIter=nIter, key=k)
        beat = "EnOpt beat the grid" if objs[-1] > vals[i_best] else "grid beat EnOpt"
        report("multi_rate EnOpt", objs, f"rates*={path[-1].round(2)} ({beat})")

    # ---- Case: time-dependent multi-well rates (reference :732-777) -----------
    if "time_rates" in cases:
        triangle = [0, 135, -135]
        m3 = base.replace(
            name="Triangle case",
            inj_xy=[[Lx / 2, Ly / 2]] + [pCircle(th + 90, Lx, Ly) for th in triangle],
            prd_xy=[pCircle(th - 90, Lx, Ly) for th in triangle],
            inj_rates=rate0 * np.ones((4, 1)) / 4,
            prd_rates=rate0 * np.ones((3, 1)) / 3,
        )
        nInterval = 5 if args.small else 10

        def obj_tr(u):
            split_at = nInterval * m3.nInj
            inj = rate_transform(u[:split_at], m3.nInj, nInterval, nTime)
            prd = rate_transform(u[split_at:], m3.nPrd, nInterval, nTime)
            inj, prd = balance_rates(inj, prd)
            return npv_value(m3, cfg, inj_rates=inj, prd_rates=prd)

        key, k1, k2 = jax.random.split(key, 3)
        u0 = -1.4 + 1e-2 * jax.random.normal(k1, ((m3.nInj + m3.nPrd) * nInterval,))
        path, objs, info = hm.GD(obj_tr, u0, nabla=hm.EnGrad(chol=0.6, nEns=20),
                                 nIter=nIter, key=k2)
        report("time_rates EnOpt", objs)

    # ---- Robust optimisation under uncertain permeability (reference :809-950) -
    if "robust" in cases:
        nEns = 8 if args.small else 31
        key, k_uq, k_u0, k_gd = jax.random.split(key, 4)
        uq_pre = hm.sample_prior_perm(k_uq, base, N=nEns, r=0.8)
        uq_ens = 0.1 + jnp.exp(5 * uq_pre)  # permeability fields (nEns, Nxy)

        def obj1(u, x):
            Kx = x.reshape(base.shape)
            return npv_value(base, cfg, inj_xy=u.reshape(1, 2), K=jnp.stack([Kx, Kx]))

        def obj_robust(u):
            return jnp.mean(jax.vmap(lambda x: obj1(u, x))(uq_ens))

        u0 = jax.random.uniform(k_u0, (2,)) * jnp.array([Lx, Ly])
        ctrl_robust = None
        for strategy in ["StoSAG", "Paired", "Mean-model"]:
            ng = hm.EnGrad(chol=0.1, nEns=nEns, robustly=strategy, obj_ux=obj1, X=uq_ens)
            path, objs, info = hm.GD(obj_robust, u0, nabla=ng, nIter=nIter, key=k_gd)
            report(f"robust[{strategy}]", objs, f"u*={path[-1].round(2)}")
            if strategy == "StoSAG":
                ctrl_robust = path[-1]

        # -- Per-member exhaustive verification (reference :958-997) ----------
        # For each uncertainty member: EnOpt its nominal optimum AND find the
        # global optimum by exhausting the objective on the grid; count
        # members whose EnOpt answer is significantly suboptimal.
        t0 = time.time()
        ctrl_nominal = []
        for n in range(nEns):
            key, kn, ku = jax.random.split(key, 3)
            u0n = jax.random.uniform(ku, (2,)) * jnp.array([Lx, Ly])
            pth, _, _ = hm.GD(lambda u, x=uq_ens[n]: obj1(u, x), u0n,
                              nabla=hm.EnGrad(chol=0.1), nIter=nIter, key=kn)
            ctrl_nominal.append(np.asarray(pth[-1]))
        ctrl_nominal = np.asarray(ctrl_nominal)
        pts = mesh2list(*base.mesh)  # (Nxy, 2) cell centres

        def member_landscape(x):
            f = jax.vmap(lambda u, x=x: obj1(u, x))
            return jax.lax.map(f, pts.reshape(-1, Ny, 2)).reshape(-1)

        npv_mesh = jnp.stack([member_landscape(x) for x in uq_ens])
        ctrl_global = np.stack(
            np.asarray(base.ind2xy(np.asarray(jnp.argmax(npv_mesh, axis=1)))), -1
        )
        err = (ctrl_global - ctrl_nominal) / np.array([Lx, Ly])
        RMS = np.sqrt(np.mean(err**2, -1))
        n_bad = int((RMS > 0.1).sum())
        print(f"[robust] Number of significantly suboptimal EnOpt answer: "
              f"{n_bad} of {len(RMS)} [{time.time() - t0:.1f}s]")

        # -- KDE performance densities: robust vs nominal (reference :1009-1066)
        npvs_robust = np.asarray(
            jax.vmap(lambda x: obj1(jnp.asarray(ctrl_robust), x))(uq_ens)
        )
        npvs_condnl = np.asarray(
            jax.vmap(lambda u: jax.vmap(lambda x: obj1(u, x))(uq_ens))(
                jnp.asarray(ctrl_nominal)
            )
        )
        print(f"[robust]          Mean    Min")
        print(f"[robust] Robust:  {npvs_robust.mean():<6.3g}  {npvs_robust.min():.3g}")
        print(f"[robust] Nominal: {npvs_condnl.mean():<6.3g}  {npvs_condnl.min():.3g}")
        if args.plot:
            os.makedirs(args.outdir, exist_ok=True)
            from historymatching_tpu import plotting

            fig = plotting.npv_kde(npvs_condnl, npvs_robust)
            fig.savefig(os.path.join(args.outdir, "npv_kde.png"), dpi=120)
            print(f"[robust] KDE figure written to {args.outdir}/npv_kde.png")

    # ---- Multi-objective: Pareto sweep over inj price (reference :1069-1139) ---
    if "pareto" in cases:
        m5 = base.replace(
            name="Angga2022-5spot",
            prd_xy=[[Lx / 2, Ly / 2]],
            inj_xy=xy_4corners,
            prd_rates=rate0 * np.ones((1, 1)),
            inj_rates=rate0 * np.ones((4, 1)) / 4,
        )
        sales, emissions = [], []
        for xCost in ([0.2, 0.6] if args.small else np.arange(0.1, 1.0, 0.2)):
            cfg_x = cfg.replace(price_inj=20.0 * float(xCost))

            def obj_p(r, cfg_x=cfg_x):
                prd = r.reshape(1, 1)
                inj = equalize(prd, m5.nInj)
                return npv_value(m5, cfg_x, prd_rates=prd, inj_rates=inj)

            key, k = jax.random.split(key)
            path, objs, _ = hm.GD(obj_p, jnp.array([2.0]),
                                  nabla=hm.EnGrad(chol=0.1), nIter=nIter, key=k)
            r_opt = path[-1].reshape(1, 1)
            _, other = hm.npv(m5, cfg_x, prd_rates=r_opt,
                              inj_rates=np.asarray(equalize(jnp.asarray(r_opt), m5.nInj)))
            led = other["ledgr"]
            sales.append(float(led["oil"]))
            emissions.append(-(float(led["inj"]) + float(led["wat"])))
        print("[pareto] sales:", np.round(sales, 2), " emissions:", np.round(emissions, 2))

    # ---- Case: toy-objective GD trial sweep (reference Optimise.py:352-421) -
    # Headless analogue of the reference's interactive trial dashboard
    # (sliders: case, seed, nTrial, aspect, xStep, sdev, precond, nrmlz,
    # nEns): a grid of configurations x random starts, each trial one
    # on-device `gd_scan`, printed as a table of median initial -> final
    # objective. The rastrigin row with sdev 0.3 shows the EnOpt smoothing
    # effect (large mutation radius averages out the ripples -> escapes
    # local minima that trap the sdev 0.05 row).
    if "toys" in cases:
        from historymatching_tpu.opt.enopt import gd_scan

        def quadratic(u):
            return jnp.mean(u * u, axis=-1)

        def rosenbrock(u):
            u = u * 3.0
            t1 = u[..., 1:] - u[..., :-1] ** 2
            t2 = u[..., :-1] - 1
            return jnp.sum(100 * t1 * t1 + t2 * t2, axis=-1)

        def rastrigin(u):
            u = u * 5.12
            return 20 + jnp.sum(u * u - 5 * jnp.cos(2 * jnp.pi * u), axis=-1)

        toys = dict(quadratic=quadratic, rosenbrock=rosenbrock,
                    rastrigin=rastrigin)
        nTrial = 3 if args.small else 5
        nIter_t = 20 if args.small else 40
        grid = [
            # (case, aspect, sdev, nEns, precond, nrmlz)
            ("quadratic", 0.0, 0.1, 10, False, True),
            ("quadratic", -1.0, 0.1, 10, False, True),   # anisotropic
            ("quadratic", -1.0, 0.1, 10, True, True),    # precond fixes it
            ("rosenbrock", 0.0, 0.05, 30, False, True),
            ("rosenbrock", 0.0, 0.05, 30, False, False),
            ("rastrigin", 0.0, 0.05, 40, False, True),   # trapped
            ("rastrigin", 0.0, 0.3, 40, False, True),    # smoothing escapes
        ]
        print(f"[toys] GD trial sweep ({nTrial} starts, {nIter_t} iters)")
        print(f"  {'case':<11}{'aspect':>7}{'sdev':>6}{'nEns':>5}"
              f"{'precond':>8}{'nrmlz':>6}{'med(J0)':>10}{'med(Jend)':>10}")
        for name, aspect, sdev, nEns, precond, nrmlz in grid:
            f = toys[name]
            scale = jnp.array([1.0, 10.0 ** aspect])
            obj = lambda u, f=f, scale=scale: f(u * scale)  # noqa: E731
            J0s, Jns = [], []
            for i in range(nTrial):
                k_u, k_gd = jax.random.split(jax.random.PRNGKey(100 * args.seed + i))
                u0 = 2.0 * (jax.random.uniform(k_u, (2,)) - 0.5)
                _, objs_t, _ = gd_scan(obj, u0, chol=sdev, nEns=nEns,
                                       precond=precond, nrmlz=nrmlz, sign=-1,
                                       nIter=nIter_t, key=k_gd)
                J0s.append(float(objs_t[0]))
                Jns.append(float(objs_t[-1]))
            print(f"  {name:<11}{aspect:>7.1f}{sdev:>6.2f}{nEns:>5}"
                  f"{str(precond):>8}{str(nrmlz):>6}"
                  f"{np.median(J0s):>10.3f}{np.median(Jns):>10.3f}")


if __name__ == "__main__":
    main()
