"""Cross-pass pressure warm start (simulate p_init / keep_pressures).

The ES-MDA workload re-simulates slightly-updated ensembles each pass;
feeding pass k's pressure trajectories into pass k+1's solves changes only
the CG iterate path, never the acceptance criterion. These tests pin the
contract on the CPU/XLA path (the TPU/Pallas path shares the p0 plumbing;
on-chip equivalence is covered by tests_tpu/).
"""

import jax
import jax.numpy as jnp
import numpy as np

from historymatching_tpu.da.geostat import gaussian_fields_fft
from historymatching_tpu.models.ressim import simulate
from historymatching_tpu.parallel.runner import forward_model, set_perm
from tests.test_sim import default_model


def _prior(m, N=4, seed=11):
    return gaussian_fields_fft(jax.random.PRNGKey(seed), m.grid, N=N,
                               r=0.8).astype(jnp.float64)


def test_keep_pressures_shape_and_consistency():
    """keep_pressures returns the per-step solutions: re-solving with
    p_init = own trajectory converges immediately (same solution, ~zero
    iterations)."""
    m = default_model(Nx=16, Ny=16)
    prior = _prior(m)
    kw = dict(dt=0.025, nTime=8, keep_wsats=False, tol=1e-10, maxiter=4096,
              patience_iters=4096)
    last, prods, ptraj = forward_model(m, prior, keep_pressures=True, **kw)
    assert ptraj.shape == (4, 8, m.Nxy)
    assert bool(jnp.isfinite(ptraj).all())

    res0 = simulate(set_perm(m, prior[0]), jnp.zeros(m.Nxy, jnp.float64),
                    0.025, 8, tol=1e-10, maxiter=4096, patience_iters=4096)
    res_ws = simulate(set_perm(m, prior[0]), jnp.zeros(m.Nxy, jnp.float64),
                      0.025, 8, tol=1e-10, maxiter=4096, patience_iters=4096,
                      p_init=ptraj[0])
    np.testing.assert_allclose(np.asarray(res_ws.wsats), np.asarray(res0.wsats),
                               rtol=0, atol=1e-9)
    # warm-started from the exact solutions, every solve is a cache hit
    assert float(res_ws.cg_iters.sum()) <= 0.2 * float(res0.cg_iters.sum()), (
        float(res_ws.cg_iters.sum()), float(res0.cg_iters.sum()))


def test_warm_start_forward_matches_cold():
    """Warm starts from a NEARBY model's trajectory: same converged results
    (to solver tolerance), fewer iterations."""
    m = default_model(Nx=16, Ny=16)
    prior = _prior(m)
    kw = dict(dt=0.025, nTime=8, keep_wsats=False, tol=1e-10, maxiter=4096,
              patience_iters=4096)
    _, _, ptraj = forward_model(m, prior, keep_pressures=True, **kw)

    nearby = prior + 0.05 * _prior(m, seed=12)
    _, prods_cold = forward_model(m, nearby, **kw)
    _, prods_warm, _ = forward_model(m, nearby, p_init=ptraj,
                                     keep_pressures=True, **kw)
    np.testing.assert_allclose(np.asarray(prods_warm), np.asarray(prods_cold),
                               rtol=0, atol=1e-7)

    def iters(p, pi):
        r = simulate(set_perm(m, p), jnp.zeros(m.Nxy, jnp.float64), 0.025, 8,
                     tol=1e-10, maxiter=4096, patience_iters=4096, p_init=pi)
        return r.cg_iters.sum()

    it_warm = float(sum(iters(nearby[i], ptraj[i]) for i in range(4)))
    it_cold = float(sum(iters(nearby[i], None) for i in range(4)))
    assert it_warm < it_cold, (it_warm, it_cold)


def test_es_mda_warm_start_equivalent_posterior():
    """The full bench workload with warm_start on vs off at tight f64
    settings: posteriors agree to solver tolerance (the warm start changes
    iterate paths, not solutions)."""
    import bench

    case = bench.build_case(seed=5, N=12, Nx=16, Ny=16, nTime=10)
    kw = dict(tol=1e-10, maxiter=4096, patience_iters=4096)
    wl_cold, _, prior = bench.make_workload(case, jnp.float64, warm_start=False,
                                            **kw)
    wl_warm, _, _ = bench.make_workload(case, jnp.float64, warm_start=True,
                                        **kw)
    post_cold = wl_cold(prior, case["key_mda"])
    post_warm = wl_warm(prior, case["key_mda"])
    np.testing.assert_allclose(np.asarray(post_warm), np.asarray(post_cold),
                               rtol=0, atol=1e-6)
    # repeat invocation must reset the trajectory state (same answer again)
    post_warm2 = wl_warm(prior, case["key_mda"])
    np.testing.assert_allclose(np.asarray(post_warm2), np.asarray(post_warm),
                               rtol=0, atol=0)
