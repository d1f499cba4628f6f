"""EnOpt tests: toy objectives (reference Optimise.py:346-421) and transforms."""

import jax
import jax.numpy as jnp
import numpy as np

from historymatching_tpu.opt.enopt import Backtracker, EnGrad, GD
from historymatching_tpu.opt.transforms import (
    balance_rates,
    coordinate_transform,
    equalize,
    rate_transform,
    sigmoid,
)


def quadratic(u):
    return jnp.mean(u * u, axis=-1)


def rosenbrock(u):
    u = u * 3.0
    t1 = u[..., 1:] - u[..., :-1] ** 2
    t2 = u[..., :-1] - 1
    return jnp.sum(100 * t1 * t1 + t2 * t2, axis=-1)


def rastrigin(u):
    """Multimodal toy, scaled to the [-1, 1]^2 box (reference
    Optimise.py:365-367): global minimum 0 at u = 0, with a lattice of local
    minima of pitch ~0.2 in u — the one toy that probes basin-hopping."""
    u = u * 5.12
    return 20 + jnp.sum(u * u - 5 * jnp.cos(2 * jnp.pi * u), axis=-1)


def test_gd_quadratic_converges(key):
    path, objs, info = GD(
        quadratic,
        jnp.array([0.8, -0.6]),
        nabla=EnGrad(chol=0.1, nEns=20),
        line_search=Backtracker(sign=-1),
        nIter=50,
        key=key,
    )
    assert objs[-1] < 0.01
    assert objs[-1] < objs[0]
    assert np.all(np.diff(objs) <= 0)  # line search guarantees monotonicity


def test_gd_quadratic_precond(key):
    path, objs, info = GD(
        quadratic,
        jnp.array([0.5, 0.5]),
        nabla=EnGrad(chol=0.1, nEns=20, precond=True),
        line_search=Backtracker(sign=-1),
        nIter=50,
        key=key,
    )
    assert objs[-1] < 0.02


def test_gd_rosenbrock_improves(key):
    path, objs, info = GD(
        rosenbrock,
        jnp.array([-0.7, 0.9]),
        nabla=EnGrad(chol=0.05, nEns=30),
        line_search=Backtracker(sign=-1),
        nIter=60,
        key=key,
    )
    assert objs[-1] < 0.2 * objs[0]


SMALL_STEPS = tuple(0.05 * 0.5**i for i in range(6))  # stay within one basin


def test_gd_rastrigin_local_basin(key):
    """With a SMALL smoothing radius AND trial steps shorter than the ridge
    pitch (0.2 in u), the ensemble gradient is near-exact: starting inside
    the global basin (|5.12 u| < 0.5) GD must converge to the global
    minimum — value 10 in the reference's scaling, 20 - 2*5 at u = 0 —
    and not jump ridges."""
    path, objs, info = GD(
        rastrigin,
        jnp.array([0.05, -0.04]),
        nabla=EnGrad(chol=0.01, nEns=30),
        line_search=Backtracker(sign=-1, xSteps=SMALL_STEPS),
        nIter=40,
        key=key,
    )
    assert objs[-1] < 10.1, objs[-1]
    assert np.all(np.abs(np.asarray(path[-1])) < 0.02)


def test_gd_rastrigin_smoothing_escapes_local_minima(key):
    """The EnOpt property the multimodal toy exists to demonstrate: a LARGE
    mutation radius Gaussian-smooths the objective — E[f(u + e)] attenuates
    the cos ripples by exp(-(2 pi sigma_x)^2 / 2) while keeping the u^2
    bowl — so the ensemble gradient walks THROUGH local minima that trap a
    (near-)exact-gradient descent started outside the global basin."""
    u0 = jnp.array([0.55, -0.45])  # many ridges away from the optimum
    # exact-gradient proxy: tiny smoothing + short steps -> trapped
    _, objs_small, _ = GD(
        rastrigin, u0, nabla=EnGrad(chol=0.005, nEns=40),
        line_search=Backtracker(sign=-1, xSteps=SMALL_STEPS), nIter=60, key=key,
    )
    # large smoothing (sigma_x = 5.12 * 0.2 ~ 1): reaches the global basin
    path_big, objs_big, _ = GD(
        rastrigin, u0, nabla=EnGrad(chol=0.2, nEns=64),
        line_search=Backtracker(sign=-1), nIter=60, key=key,
    )
    assert np.all(np.abs(np.asarray(path_big[-1])) < 0.15), path_big[-1]
    assert objs_big[-1] < 12.0, objs_big[-1]  # global basin (local minima >= ~12)
    assert objs_small[-1] > 15.0, objs_small[-1]  # trapped several ridges out
    assert objs_big[-1] < objs_small[-1]


def test_backtracker_accept_first_semantics():
    # objective improves only for small steps: accept-first must pick the
    # first acceptable (i.e. nDeclined = count of too-large leading steps)
    def obj(u):
        return -jnp.sum(u * u)  # maximise => want u1 closer to 0

    u0 = jnp.array([1.0])
    J0 = float(obj(u0))
    bt = Backtracker(sign=+1)
    # direction d: u1 = u0 + sign*step*d. Choose d=-1 so u1 = 1 - step.
    res = bt(obj, u0, J0, jnp.array([-1.0]))
    assert res is not None
    u1, J1, info = res
    assert info["nDeclined"] == 0
    assert np.isclose(u1[0], 0.5)  # first trial step 0.5


def test_backtracker_returns_none_at_optimum():
    def obj(u):
        return -jnp.sum(u * u)

    bt = Backtracker(sign=+1, rtol=1e-8)
    res = bt(obj, jnp.array([0.0]), 0.0, jnp.array([1.0]))
    assert res is None


def test_engrad_robust_strategies(key):
    """All robust gradient forms point roughly along the true gradient of
    the mean objective J(u) = -mean_x ||u - x||^2 at u away from mean(x)."""
    kX, kg = jax.random.split(key)
    nEns = 30
    X = 0.1 * jax.random.normal(kX, (nEns, 2)) + jnp.array([1.0, 0.0])

    def obj_ux(u, x):
        return -jnp.sum((u - x) ** 2)

    def obj(u):
        return jnp.mean(jax.vmap(lambda x: obj_ux(u, x))(X))

    u = jnp.array([0.0, 0.0])
    true_grad = np.array([2.0, 0.0])  # d/du of -(u-1)^2 at 0 is +2
    for strategy in [None, "Paired", "StoSAG", "Mean-model"]:
        ng = EnGrad(chol=0.1, nEns=nEns, robustly=strategy, obj_ux=obj_ux, X=X)
        g = np.asarray(ng(obj, u, kg))
        cos = g @ true_grad / (np.linalg.norm(g) * np.linalg.norm(true_grad))
        assert cos > 0.9, (strategy, g)


def test_transforms():
    assert np.isclose(float(sigmoid(0.0, 2.0)), 1.0)
    xy = coordinate_transform(np.array([0.0, 0.0, 10.0, -10.0]), 2.0, 1.0)
    xy = np.asarray(xy)
    assert np.allclose(xy[:2], [1.0, 0.5])
    assert xy[2] > 1.99 and xy[3] < 0.01

    rates = rate_transform(np.log(np.array([0.5, 0.05, 1.0, 2.0])), 2, 2, 5)
    rates = np.asarray(rates)
    assert rates.shape == (2, 5)
    assert np.allclose(rates[0], [0.5, 0.5, 0.5, 0.0, 0.0])  # snapped 0.05 -> 0
    assert np.allclose(rates[1], [1.0, 1.0, 1.0, 2.0, 2.0])

    eq = np.asarray(equalize(np.array([[1.0, 2.0], [3.0, 2.0]]), 4))
    assert eq.shape == (4, 2)
    assert np.allclose(eq.sum(0), [4.0, 4.0])

    inj, prd = balance_rates(np.array([[2.0, 1.0]]), np.array([[1.0, 2.0]]))
    assert np.allclose(np.asarray(inj).sum(0), np.asarray(prd).sum(0))
    assert np.allclose(np.asarray(inj).sum(0), [1.0, 1.0])


def test_gd_scan_matches_host_gd(key):
    """The on-device lax.scan GD must reproduce the host-loop GD exactly
    (same key => same perturbations => same trajectory) on a toy."""
    import jax.numpy as jnp

    from historymatching_tpu.opt.enopt import GD, EnGrad, gd_scan

    def quad(u):
        return -jnp.sum((u - 0.3) ** 2)  # maximize => optimum at 0.3

    u0 = jnp.array([0.9, -0.5])
    path_h, objs_h, info_h = GD(quad, u0, nabla=EnGrad(chol=0.1), nIter=40, key=key)
    path_d, objs_d, info_d = gd_scan(quad, u0, chol=0.1, nIter=40, key=key)
    assert np.allclose(path_d[-1], path_h[-1], atol=1e-6), (path_d[-1], path_h[-1])
    assert abs(objs_d[-1] - objs_h[-1]) < 1e-8
    assert np.allclose(path_d[-1], 0.3, atol=0.05)
    assert info_d["cause"] == info_h["cause"]
    # full-trajectory agreement (not just the endpoint)
    n = min(len(path_h), len(path_d))
    assert np.allclose(path_d[:n], path_h[:n], atol=1e-6)


def test_gd_scan_multi_matches_per_start(key):
    """Batched multistart GD (one vmapped program) must reproduce each
    start's solo `gd_scan` run bit-for-bit: the per-start PRNG streams are
    the same `jax.random.split(key, nStart)` either way."""
    import jax
    import jax.numpy as jnp

    from historymatching_tpu.opt.enopt import gd_scan, gd_scan_multi

    def quad(u):
        return -jnp.sum((u - 0.3) ** 2)

    U0 = jnp.array([[0.9, -0.5], [-1.2, 0.8], [0.0, 2.0]])
    paths, objs, info = gd_scan_multi(quad, U0, chol=0.1, nIter=30, key=key)
    assert paths.shape == (3, 31, 2) and objs.shape == (3, 31)
    keys = jax.random.split(key, 3)
    for i in range(3):
        p_i, o_i, inf_i = gd_scan(quad, U0[i], chol=0.1, nIter=30, key=keys[i])
        assert int(info["nIter"][i]) == inf_i["nIter"]
        n = inf_i["nIter"] + 1
        assert np.allclose(paths[i, :n], p_i, atol=0), (i, paths[i, :n], p_i)
        # frozen tail: rows past convergence repeat the converged state
        assert np.allclose(paths[i, n - 1 :], p_i[-1], atol=0)
        assert np.allclose(objs[i, :n], o_i, atol=0)
    # every start converges to the optimum
    assert np.allclose(paths[:, -1], 0.3, atol=0.05)


def test_gd_scan_precond_and_budget(key):
    import jax.numpy as jnp

    from historymatching_tpu.opt.enopt import gd_scan

    def quad(u):
        return -jnp.sum(u * u)

    path, objs, info = gd_scan(quad, jnp.array([1.0, 1.0, -2.0]), chol=0.2,
                               precond=True, nIter=25, key=key)
    assert objs[-1] > objs[0]
    assert len(path) == len(objs) == info["nIter"] + 1


def test_flat_objective_zero_gradient_guard(key):
    """A locally flat objective (e.g. pre-breakthrough NPV: every member
    identical) yields an exactly-zero ensemble gradient; the nrmlz division
    must not NaN the trials — GD stops as converged, gd_scan freezes."""
    import warnings

    import jax.numpy as jnp

    from historymatching_tpu.opt.enopt import gd_scan

    def flat(u):
        return jnp.asarray(0.0) * jnp.sum(u)

    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        path, objs, info = GD(flat, jnp.array([1.0, 2.0]), nIter=5, key=key)
        assert info["cause"] == "GD converged"
        assert len(path) == 1 and np.all(np.isfinite(path))

        path_s, objs_s, info_s = gd_scan(flat, jnp.array([1.0, 2.0]),
                                         nIter=5, key=key)
        assert np.all(np.isfinite(path_s)) and np.all(np.isfinite(objs_s))
        assert info_s["nIter"] == 0  # no step ever accepted
        assert np.allclose(path_s, path_s[0], atol=0)
