#!/usr/bin/env python
"""Multi-seed posterior-quality parity harness (BASELINE.md: "posterior-mean
RMSE parity with CPU reference"; VERDICT round-1 item 2).

Two modes:

  python scripts/parity.py ref           # CPU float64 reference (slow)
      Runs the bench configuration (64x64, nTime=40, ES-MDA(4)) at N=PARITY_N
      members for seeds 1..5 on the CPU backend in float64 (the XLA path —
      no Pallas, no f32 floors) and writes parity/cpu_f64_refs.json.
      Committed: the reference is deterministic per seed.

  python scripts/parity.py run           # current backend (run on TPU)
      Same seeds/config in float32 on the default backend (on TPU: Pallas
      kernels — the exact bench pipeline), compares posterior-mean RMSE per
      seed against the committed reference, writes parity/PARITY_TPU.json
      with the per-seed ratios. PASS criterion (folded into bench.py output):
      median(rmse_post_f32 / rmse_post_f64) <= 1.05.

Both sides consume bit-identical float32 stochastic inputs (truth field,
prior, obs noise) from bench.build_case; each side runs its own truth
simulation + obs synthesis (part of the pipeline under test). N defaults to
100 (not 1000): kernel-accuracy parity is N-independent, and the CPU-f64
reference at N=1000 would take hours; the sampling error the posterior
carries at N=100 is identical on both sides because the draws are paired.

Env: PARITY_N (default 100), PARITY_SEEDS (comma list, default 1,2,3,4,5),
PARITY_SIM_KW (json dict of simulate kwargs, e.g. '{"patience_iters": 192}').
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT_DIR = os.path.join(REPO, "parity")

SEEDS = [int(s) for s in os.environ.get("PARITY_SEEDS", "1,2,3,4,5").split(",")]
N = int(os.environ.get("PARITY_N", "100"))
THRESHOLD = 1.05


def _sim_kw():
    import bench

    kw = bench.bench_sim_kwargs()  # mirror the official bench settings
    kw.update(json.loads(os.environ.get("PARITY_SIM_KW", "{}")))
    return kw


def _ref_sim_kw():
    """f64 reference solver effort: tol 1e-8 (5 orders below any f32 floor)
    with bounded budgets — the f64 DEFAULTS (tol 1e-10, maxiter Nxy=4096)
    grind for hours per seed on this machine's single CPU core without
    changing the posterior at the digits the ratio test reads."""
    kw = dict(tol=1e-8, maxiter=768, patience_iters=192)
    kw.update(json.loads(os.environ.get("PARITY_REF_SIM_KW", "{}")))
    return kw


def mode_ref():
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import bench

    rows = []
    for seed in SEEDS:
        r = bench.run_case(seed, N, dtype=jnp.float64, timed=False, **_ref_sim_kw())
        r["dtype"] = "float64"
        print(r, flush=True)
        rows.append(r)
    os.makedirs(OUT_DIR, exist_ok=True)
    out = dict(N=N, seeds=SEEDS, config="64x64 nTime=40 ES-MDA(4)",
               sim_kwargs=_ref_sim_kw(), backend="cpu", rows=rows)
    with open(os.path.join(OUT_DIR, "cpu_f64_refs.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote parity/cpu_f64_refs.json")


def mode_run():
    import jax
    import jax.numpy as jnp

    import bench

    with open(os.path.join(OUT_DIR, "cpu_f64_refs.json")) as f:
        ref = json.load(f)
    assert ref["N"] == N and ref["seeds"] == SEEDS, (
        "reference config mismatch: regenerate with scripts/parity.py ref"
    )
    ref_by_seed = {r["seed"]: r for r in ref["rows"]}

    rows, ratios, dir_match = [], [], 0
    for seed in SEEDS:
        r = bench.run_case(seed, N, dtype=jnp.float32, timed=False, **_sim_kw())
        r["dtype"] = "float32"
        r["rmse_post_ref"] = ref_by_seed[seed]["rmse_post"]
        r["ratio"] = r["rmse_post"] / r["rmse_post_ref"]
        # does the f32 posterior improve/worsen vs its prior the same way
        # the f64 one does? (worse-than-prior posteriors happen in f64 too —
        # they are properties of the realization, not the arithmetic)
        f64_improves = ref_by_seed[seed]["rmse_post"] < ref_by_seed[seed]["rmse_prior"]
        f32_improves = r["rmse_post"] < r["rmse_prior"]
        r["improves_matches_f64"] = bool(f32_improves == f64_improves)
        dir_match += r["improves_matches_f64"]
        ratios.append(r["ratio"])
        print(r, flush=True)
        rows.append(r)

    ratios_sorted = sorted(ratios)
    median = ratios_sorted[len(ratios) // 2] if len(ratios) % 2 else 0.5 * (
        ratios_sorted[len(ratios) // 2 - 1] + ratios_sorted[len(ratios) // 2]
    )
    out = dict(
        N=N, seeds=SEEDS, config=ref["config"], sim_kwargs=_sim_kw(),
        backend=jax.devices()[0].platform,
        rows=rows,
        ratio_median=round(median, 4),
        ratio_max=round(max(ratios), 4),
        ratio_min=round(min(ratios), 4),
        improves_direction_matches=f"{dir_match}/{len(SEEDS)}",
        threshold=THRESHOLD,
        ok=bool(median <= THRESHOLD),
    )
    with open(os.path.join(OUT_DIR, "PARITY_TPU.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("ratio_median", "ratio_min", "ratio_max", "ok")}))
    print("wrote parity/PARITY_TPU.json")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "run"
    if mode == "ref":
        mode_ref()
    elif mode == "run":
        mode_run()
    else:
        raise SystemExit(f"unknown mode {mode!r} (use 'ref' or 'run')")
