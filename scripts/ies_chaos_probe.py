#!/usr/bin/env python
"""Diagnose the IES f32/f64 parity scatter (PARITY_TPU_IES.json):
is a per-seed ratio like 1.33 a systematic f32 deficiency, or chaotic
amplification of rounding noise over the 10 Gauss-Newton re-simulations?

Two measurements at the parity shape (N=192, run on TPU), against the
committed exact-f64-oracle refs (parity/cpu_f64_refs_ies.json):

1. `perturb`: the official bench settings, with the prior scaled by
   (1 + 1e-6) — a single input perturbation at f32 ULP scale. IES runs are
   deterministic (bit-identical re-runs), so any spread between the base and
   perturbed posterior RMSE is pure sensitivity of the 10-iteration GN map.
   If |rmse_post(perturbed) - rmse_post(base)| is comparable to the
   f32-vs-f64 gap itself, that gap is chaos, not bias.

2. `tight`: forward solves 10x tighter than the bench default
   (tol 2e-5, maxiter 1536, patience 512). If the per-seed ratios contract
   toward 1, the scatter is forward-solve truncation noise (and a tighter
   last-iteration schedule would buy real parity); if they merely shuffle,
   the scatter floor is intrinsic f32 rounding.

Prints one JSON line per seed with base/perturbed/tight posterior RMSEs and
ratios vs the f64-exact reference. Writes nothing; findings land in
PARITY.md and the criterion in scripts/parity.py.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TIGHT = dict(tol=2e-5, maxiter=1536, patience_iters=512)


def main():
    import bench

    with open(os.path.join(REPO, "parity", "cpu_f64_refs_ies.json")) as f:
        ref = json.load(f)
    ref_rows = {r["seed"]: r for r in ref["rows"]}
    N = ref["N"]

    base_kw = {k: v for k, v in bench.bench_ies_kwargs().items()
               if k != "ies_sched"}
    seeds = [int(s) for s in (sys.argv[1:] or ref_rows)]

    for seed in seeds:
        rr = ref_rows[seed]
        case = bench.build_case(seed, N, 64, 64, 40)
        row = {"seed": seed, "rmse_post_ref": round(rr["rmse_post"], 4)}

        _, _, e_base = bench._ies_one(case, base_kw)
        row["base"] = round(e_base, 4)
        row["base_ratio"] = round(e_base / rr["rmse_post"], 4)

        pert = dict(case, prior=case["prior"] * (1 + 1e-6))
        _, _, e_pert = bench._ies_one(pert, base_kw)
        row["perturb"] = round(e_pert, 4)
        row["perturb_minus_base"] = round(e_pert - e_base, 4)

        _, _, e_tight = bench._ies_one(case, dict(base_kw, **TIGHT))
        row["tight"] = round(e_tight, 4)
        row["tight_ratio"] = round(e_tight / rr["rmse_post"], 4)

        row["f32_vs_f64_gap"] = round(e_base - rr["rmse_post"], 4)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
