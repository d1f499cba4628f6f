#!/usr/bin/env python
"""Screen per-MDA-pass solver-effort schedules (round-2 VERDICT item 3).

The measured quality-speed curve (bench.bench_sim_kwargs docstring) shows the
wall-clock is bought by solver effort for the last accuracy digits — but the
ES-MDA analysis only needs accurate *final* innovations, so passes 1..3 can
run looser than pass 4. This probe measures, per candidate schedule:

  - N=1000 flagship wall-clock (the official bench timing protocol:
    warm-up + best-of-2), and
  - the f32/f64 posterior-RMSE ratio at N=192 for every seed already present
    in the committed f64 reference (parity/cpu_f64_refs.json) — the same
    comparison scripts/parity.py makes.

Writes nothing; prints one JSON line per candidate. Run on TPU with the
machine otherwise quiet.

Usage: python scripts/sched_probe.py [candidate ...]
  candidates: names from CANDIDATES below (default: all)
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Pass-effort presets (overrides on top of the official base settings).
LOOSE = dict(tol=2e-3, maxiter=256, patience_iters=128)
LOOSE8 = dict(tol=2e-3, maxiter=256, patience_iters=128, twopass_div=8)
XLOOSE = dict(tol=5e-3, maxiter=192, patience_iters=96)
MED = dict(tol=5e-4, maxiter=512, patience_iters=192)
TIGHT = {}  # base settings (tol 2e-4 / 768 / 256)

LOOSE8J32 = dict(LOOSE8, twopass_j1=32)
XLOOSE8 = dict(tol=5e-3, maxiter=192, patience_iters=96, twopass_div=8)
TIGHT8 = dict(twopass_div=8)

CANDIDATES = {
    "base": None,                         # no schedule: uniform tight
    "LLLT": [LOOSE, LOOSE, LOOSE, TIGHT],
    "LLMT": [LOOSE, LOOSE, MED, TIGHT],
    "L8x3T": [LOOSE8, LOOSE8, LOOSE8, TIGHT],
    "XLLMT": [XLOOSE, LOOSE, MED, TIGHT],
    "LLTT": [LOOSE, LOOSE, TIGHT, TIGHT],
    # round 2 of screening: sharpen around the L8x3T winner
    "L8x3T8": [LOOSE8, LOOSE8, LOOSE8, TIGHT8],
    "L8J32x3T": [LOOSE8J32, LOOSE8J32, LOOSE8J32, TIGHT],
    "XL8L8L8T": [XLOOSE8, LOOSE8, LOOSE8, TIGHT],
    # round 3: can the tight final pass also shed recook volume / pass-1 cap?
    "L8J32x3T8": [LOOSE8J32, LOOSE8J32, LOOSE8J32, TIGHT8],
    "L8J32x3TJ32": [LOOSE8J32, LOOSE8J32, LOOSE8J32, dict(twopass_j1=32)],
    "L8J32x3T8J32": [LOOSE8J32, LOOSE8J32, LOOSE8J32,
                     dict(twopass_div=8, twopass_j1=32)],
    # round 4 (vs the exact-oracle refs): shave the final pass further
    "L8J32x3T16J32": [LOOSE8J32, LOOSE8J32, LOOSE8J32,
                      dict(twopass_div=16, twopass_j1=32)],
    "L8J32x3T8J32P128": [LOOSE8J32, LOOSE8J32, LOOSE8J32,
                         dict(twopass_div=8, twopass_j1=32,
                              patience_iters=128)],
    "XL8J32x3T8J32": [dict(XLOOSE8, twopass_j1=32)] * 3 + [
        dict(twopass_div=8, twopass_j1=32)],
    # round 5 (device-trace informed): the final pass's RECOOK kernel is
    # 1.03 s of its 2.53 s (pass-1 0.57 s, refine 0.21 s, transport 0.25 s,
    # glue ~0.45 s) and recooked members average ~550 of the 768-iteration
    # cap per step — shave the recook budget (refine's compensated-residual
    # correction solve still runs), the pass-1 cap, and the loose recooks.
    "finalM512": [LOOSE8J32, LOOSE8J32, LOOSE8J32,
                  dict(twopass_div=8, twopass_j1=32, maxiter=512)],
    "finalM384": [LOOSE8J32, LOOSE8J32, LOOSE8J32,
                  dict(twopass_div=8, twopass_j1=32, maxiter=384)],
    "J16all": [dict(LOOSE8J32, twopass_j1=16)] * 3 + [
        dict(twopass_div=8, twopass_j1=16)],
    "looseM128": [dict(LOOSE8J32, maxiter=128)] * 3 + [
        dict(twopass_div=8, twopass_j1=32)],
    # round 6: J16all won round 5 (7.68 s, ratio max 1.042 — tighter than
    # the J32 default's 1.090); combine with the recook-budget shave, and
    # probe the J8 floor.
    "J16M384": [dict(LOOSE8J32, twopass_j1=16)] * 3 + [
        dict(twopass_div=8, twopass_j1=16, maxiter=384)],
    "J16M512": [dict(LOOSE8J32, twopass_j1=16)] * 3 + [
        dict(twopass_div=8, twopass_j1=16, maxiter=512)],
    "J8all": [dict(LOOSE8J32, twopass_j1=8)] * 3 + [
        dict(twopass_div=8, twopass_j1=8)],
    # round 7: J8all won round 6 (7.21 s, ratio max 1.021 — the tightest
    # spread of any candidate); find the pass-1 floor and re-try the
    # recook-budget shave on top.
    "J4all": [dict(LOOSE8J32, twopass_j1=4)] * 3 + [
        dict(twopass_div=8, twopass_j1=4)],
    "J8M384": [dict(LOOSE8J32, twopass_j1=8)] * 3 + [
        dict(twopass_div=8, twopass_j1=8, maxiter=384)],
    "J8M512": [dict(LOOSE8J32, twopass_j1=8)] * 3 + [
        dict(twopass_div=8, twopass_j1=8, maxiter=512)],
    # round 8: J8M384 won round 7 (6.92 s; J4 == J8 bit-identical — the CG
    # kernel advances in restart_every=8 chunks, so 8 is the pass-1 floor).
    # Shave the recook budgets further.
    "J8M320": [dict(LOOSE8J32, twopass_j1=8)] * 3 + [
        dict(twopass_div=8, twopass_j1=8, maxiter=320)],
    "J8M256": [dict(LOOSE8J32, twopass_j1=8)] * 3 + [
        dict(twopass_div=8, twopass_j1=8, maxiter=256)],
    "J8M384L192": [dict(LOOSE8J32, twopass_j1=8, maxiter=192)] * 3 + [
        dict(twopass_div=8, twopass_j1=8, maxiter=384)],
    # round 9: J8M256 held parity at 6.63 s while the loose-recook shave
    # (J8M384L192) broke seed 2 (1.093) — find the FINAL recook floor only.
    "J8M192": [dict(LOOSE8J32, twopass_j1=8)] * 3 + [
        dict(twopass_div=8, twopass_j1=8, maxiter=192)],
    "J8M128": [dict(LOOSE8J32, twopass_j1=8)] * 3 + [
        dict(twopass_div=8, twopass_j1=8, maxiter=128)],
    # round 10: J8M128 held 5-seed parity at 6.36 s (round 9; re-measured
    # 6.37 s, ratios {0.995, 0.949, 1.022, 1.003, 0.968} — adopted as the
    # official DEFAULT_SCHED). Stack the freeze_coarse interval (coarse
    # Newton-Schulz inverse recomputed every k of the 40 steps instead of
    # every step; preconditioner-only, but the once-per-pass form measurably
    # hurt straggler accuracy — probe the interval) on top of it.
    # MEASURED: fc4 5.58 s but seed-3 1.072 + flagship rmse 1.082 -> 1.095;
    # fc8 5.45 s, seeds 1-2 at 1.065/1.084. REJECTED.
    "J8M128fc4": [dict(LOOSE8J32, twopass_j1=8, freeze_coarse=4)] * 3 + [
        dict(twopass_div=8, twopass_j1=8, maxiter=128, freeze_coarse=4)],
    "J8M128fc8": [dict(LOOSE8J32, twopass_j1=8, freeze_coarse=8)] * 3 + [
        dict(twopass_div=8, twopass_j1=8, maxiter=128, freeze_coarse=8)],
    # round 11: fc everywhere buys 0.8-0.9 s but costs straggler accuracy
    # where it matters (fc4 seed-3 ratio 1.072, fc8 seeds 1-2 ~1.07-1.08 —
    # under an iteration cap the preconditioner quality IS accuracy). The
    # posterior only reads the FINAL pass's innovations, so freeze the
    # coarse inverse on the loose passes only and keep pass 4 exact.
    # MEASURED: fcL4 5.78 s, seed-3 1.069, flagship rmse 1.0995; fcL8
    # 5.67 s, seed-2 1.100 — a degraded intermediate update hands pass 4 a
    # worse ensemble, so the loss survives the exact final pass. REJECTED;
    # freeze_coarse stays a capability (simulate kwarg), not a default.
    "J8M128fcL4": [dict(LOOSE8J32, twopass_j1=8, freeze_coarse=4)] * 3 + [
        dict(twopass_div=8, twopass_j1=8, maxiter=128)],
    "J8M128fcL8": [dict(LOOSE8J32, twopass_j1=8, freeze_coarse=8)] * 3 + [
        dict(twopass_div=8, twopass_j1=8, maxiter=128)],
    # round 12 (round-4 VERDICT stretch): the smoother="cheb" capability
    # (degree-nu Chebyshev V-cycle smoothing, ops/multigrid._cheb) has no
    # committed probe row. Chebyshev damps the mid-spectrum better per
    # sweep than damped Jacobi, so the PCG should need fewer iterations at
    # equal tolerance — probe it schedule-wide, final-pass-only, and with
    # the recook budget shaved on top if the iteration count drops.
    # MEASURED (on-chip, vs the J8M128 jacobi default's 5.41 s / 10-seed
    # ratios median 1.006 max 1.080): J8M128cheb 5.40 s, max 1.125;
    # J8M128chebT 5.40 s, median 0.997 max 1.084; J8M96cheb 5.33 s but
    # seed-2 1.136 (breaks even the 1.12 sweep bound). The schedule is
    # budget-capped, not tol-converged, so a better smoother saves no
    # iterations-to-tol — it only shifts quality inside the same budget,
    # and the worst seed gets slightly WORSE. REJECTED; smoother="cheb"
    # stays a capability (simulate kwarg, CPU-tested in test_sim.py).
    "J8M128cheb": [dict(LOOSE8J32, twopass_j1=8, smoother="cheb")] * 3 + [
        dict(twopass_div=8, twopass_j1=8, maxiter=128, smoother="cheb")],
    "J8M128chebT": [dict(LOOSE8J32, twopass_j1=8)] * 3 + [
        dict(twopass_div=8, twopass_j1=8, maxiter=128, smoother="cheb")],
    "J8M96cheb": [dict(LOOSE8J32, twopass_j1=8, smoother="cheb")] * 3 + [
        dict(twopass_div=8, twopass_j1=8, maxiter=96, smoother="cheb")],
}


def main():
    import jax
    import jax.numpy as jnp

    import bench

    names = sys.argv[1:] or list(CANDIDATES)
    base = {k: v for k, v in bench.bench_sim_kwargs().items() if k != "sched"}

    with open(os.path.join(REPO, "parity", "cpu_f64_refs.json")) as f:
        ref = json.load(f)
    ref_rows = {r["seed"]: r for r in ref["rows"]}
    n_par = ref["N"]

    for name in names:
        sched = CANDIDATES[name]
        t0 = time.time()
        row = {"cand": name}

        # Flagship timing, official protocol shape (N=1000, seed 1).
        r = bench.run_case(1, bench.N_ENS, dtype=jnp.float32, timed=True,
                           sched=sched, **base)
        # best-of-2: one more timed call through run_case would rebuild the
        # case; cheap to accept the single timed number here (screening).
        row.update(elapsed_s=r["elapsed_s"], first_call_s=r["first_call_s"],
                   rmse_post_n1000=round(r["rmse_post"], 4))

        # Quality ratio at the parity shape for every committed ref seed.
        ratios = {}
        for seed, rr in sorted(ref_rows.items()):
            q = bench.run_case(seed, n_par, dtype=jnp.float32, timed=False,
                               sched=sched, **base)
            ratios[str(seed)] = round(q["rmse_post"] / rr["rmse_post"], 4)
        row["ratios_n192"] = ratios
        row["probe_s"] = round(time.time() - t0, 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
