"""NPV objective / accounting tests (reference Optimise.py:112-210)."""

import jax.numpy as jnp
import numpy as np

from historymatching_tpu.models.ressim import SimResult
from historymatching_tpu.opt.npv import NPVConfig, accounting, npv, npv_value, prd_sats
from tests.test_sim import default_model


def test_accounting_hand_computed():
    """Craft a SimResult with constant zero producer saturation: oil value is
    exactly price_oil * dt * sum(prd_rates) @ discounts, etc."""
    m = default_model(Nx=8, Ny=8)
    cfg = NPVConfig(dt=0.1, nTime=3)
    nPrd = 4
    wsats = jnp.zeros((cfg.nTime + 1, m.Nxy))
    inj = jnp.ones((1, cfg.nTime))
    prd = jnp.ones((nPrd, cfg.nTime)) / nPrd
    res = SimResult(
        wsats, inj, prd, jnp.array(True), jnp.array(True), jnp.zeros(3, int), jnp.zeros(3, int)
    )
    led = accounting(cfg, m, res)
    disc = np.asarray(cfg.discounts)
    assert np.isclose(float(led["oil"]), 100.0 * 0.1 * disc.sum())
    assert np.isclose(float(led["inj"]), -20.0 * 0.1 * disc.sum())
    assert np.isclose(float(led["wat"]), 0.0)
    # per-well cost: all well-steps active
    assert np.isclose(float(led["pwell"]), -cfg.price_well * nPrd * cfg.nTime)
    assert np.isclose(float(led["iwell"]), -cfg.price_well * 1 * cfg.nTime)
    # no excess over rate0=1.5, constant inj => no turbo/diffs
    assert float(led["turbo"]) == 0.0
    assert float(led["diffs"]) == 0.0


def test_prd_sats_trapezoid():
    m = default_model(Nx=8, Ny=8)
    inds = np.asarray(m.xy2ind(m.prd_xy[:, 0], m.prd_xy[:, 1]))
    wsats = jnp.zeros((3, m.Nxy)).at[1, inds].set(0.5).at[2, inds].set(1.0)
    ps = np.asarray(prd_sats(m, wsats))
    assert ps.shape == (2, 4)
    assert np.allclose(ps[0], 0.25)
    assert np.allclose(ps[1], 0.75)


def test_npv_runs_and_penalizes():
    m = default_model(Nx=10, Ny=10)
    cfg = NPVConfig(dt=0.025, nTime=5)
    v, other = npv(m, cfg)
    assert np.isfinite(float(v))
    assert float(v) != 0.0
    # unbalanced rates => penalty 0 (exception-as-penalty equivalent)
    v_bad = npv_value(m, cfg, inj_rates=[[2.0]])
    assert float(v_bad) == 0.0
    # out-of-domain injector => penalty 0
    v_out = npv_value(m, cfg, inj_xy=[[9.0, 0.5]])
    assert float(v_out) == 0.0


def test_npv_gates_on_cg_ok(monkeypatch):
    """A non-converged pressure solve (cg_ok=False) must map the NPV to 0:
    unconverged fluxes are garbage and, measured on TPU, can spuriously
    INFLATE the value — an ascent direction EnOpt must never see (the
    reference's direct solver cannot fail, so this gate has no reference
    analogue)."""
    import sys

    # `opt.__init__` re-exports the npv FUNCTION, shadowing the submodule
    # attribute — fetch the module object itself.
    npv_mod = sys.modules["historymatching_tpu.opt.npv"]

    m = default_model(Nx=10, Ny=10)
    cfg = NPVConfig(dt=0.025, nTime=5)
    real_simulate = npv_mod.simulate

    def failing_simulate(*a, **kw):
        return real_simulate(*a, **kw)._replace(cg_ok=jnp.array(False))

    monkeypatch.setattr(npv_mod, "simulate", failing_simulate)
    assert float(npv_value(m, cfg)) == 0.0


def test_npv_moving_injector_changes_value():
    m = default_model(Nx=10, Ny=10)
    cfg = NPVConfig(dt=0.025, nTime=8)
    v_center = npv_value(m, cfg, inj_xy=[[1.0, 0.5]])
    v_corner = npv_value(m, cfg, inj_xy=[[0.05, 0.05]])
    assert float(v_center) != float(v_corner)
    # centre placement should beat a corner placement
    assert float(v_center) > float(v_corner)
