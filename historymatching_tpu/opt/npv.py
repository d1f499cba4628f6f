"""Net-present-value objective and economics (accounting).

Re-design of the reference's `npv`/`accounting` (Optimise.py:112-210):

- typed, immutable `NPVConfig` instead of notebook globals (prices/discounts
  are therefore *visible* to ensemble methods, unlike the reference's
  globals — Optimise.py:164-167);
- no exceptions under jit: invalid configurations (unbalanced rates,
  out-of-domain wells, non-converged pressure solves) zero the value via the
  simulator's `valid` flag (exception-as-penalty, Optimise.py:120-125);
- everything is jit/vmap-able, so whole control ensembles evaluate batched.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from historymatching_tpu.models.ressim import ResSim, SimResult, simulate


@dataclasses.dataclass(frozen=True)
class NPVConfig:
    """Prices and schedule (reference Optimise.py:151-162 defaults)."""

    dt: float = 0.025
    nTime: int = 40
    OneYear: float = 0.1
    rate0: float = 1.5  # suggested total production rate
    discount_rate: float = 0.96
    price_inj: float = 20.0
    price_oil: float = 100.0
    price_turbo: float = 1.0
    price_wat: float = 6.0
    price_diffs: float = 1.0
    price_fixed_base: float = 0.8  # price["fixed"] = base * dt / OneYear
    price_well_base: float = 0.3  # price["/well"] = base * dt / OneYear

    @property
    def price_well(self):
        return self.price_well_base * self.dt / self.OneYear

    @property
    def price_fixed(self):
        return self.price_fixed_base * self.dt / self.OneYear

    @property
    def discounts(self):
        return self.discount_rate ** (self.dt / self.OneYear * jnp.arange(self.nTime))

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def prd_sats(model: ResSim, wsats):
    """Saturations at producers per time interval (trapezoidal rule),
    (nTime, nPrd) (reference Optimise.py:207-210)."""
    inds = model.xy2ind(model.prd_xy[:, 0], model.prd_xy[:, 1])
    s = wsats[:, inds]
    return (s[:-1] + s[1:]) / 2


def accounting(cfg: NPVConfig, model: ResSim, res: SimResult):
    """Ledger of discounted values (reference Optimise.py:170-200)."""
    dt = cfg.dt
    discounts = cfg.discounts.astype(res.wsats.dtype)
    prd_ws = prd_sats(model, res.wsats).T  # (nPrd, nTime)
    inj_rates = res.actual_inj_rates  # (nInj, nTime)
    prd_rates = res.actual_prd_rates

    inj_volumes = dt * inj_rates
    oil_volumes = dt * prd_rates * (1.0 - prd_ws)
    wat_volumes = dt * prd_rates * prd_ws

    values = {}
    values["oil"] = +cfg.price_oil * (oil_volumes.sum(0) @ discounts)
    values["inj"] = -cfg.price_inj * (inj_volumes.sum(0) @ discounts)
    values["wat"] = -cfg.price_wat * (wat_volumes.sum(0) @ discounts)

    excess = jnp.clip(prd_rates.sum(0) - cfg.rate0, 0.0, None)
    diffs = jnp.diff(inj_rates, axis=1)
    values["pwell"] = -cfg.price_well * jnp.sum(prd_rates != 0)
    values["iwell"] = -cfg.price_well * jnp.sum(inj_rates != 0)
    values["turbo"] = -cfg.price_turbo * excess.sum() ** 2 * dt
    values["diffs"] = -cfg.price_diffs * jnp.sum(jnp.abs(diffs) ** 0.1)
    return values


def npv(model: ResSim, cfg: NPVConfig = NPVConfig(), wsat0=None, **params):
    """NPV of `model` reconfigured with keyword `params`
    (reference Optimise.py:112-125). Returns (value, other) where `other`
    holds the reconfigured model, saturations, and the ledger.

    jit/vmap-safe: invalid configurations yield value 0 (penalty) instead of
    raising.
    """
    m = model.replace(**params) if params else model
    if wsat0 is None:
        wsat0 = jnp.zeros(m.Nxy, dtype=jnp.result_type(float))
    res = simulate(m, wsat0, cfg.dt, cfg.nTime)
    ledgr = accounting(cfg, m, res)
    value = sum(ledgr.values())
    # Penalty gates on BOTH flags: invalid configs (the reference raises,
    # Optimise.py:118-125) AND non-converged pressure solves. The latter has
    # no reference analogue (its direct solver cannot fail) but is load-
    # bearing here: a garbage f32 solve's fluxes can INFLATE the NPV
    # (measured, injector at the domain corner: spurious 74 vs 37.7 exact
    # f64 — higher than the true optimum ~59) — an ascent direction the
    # optimizer must never see. The acceptance threshold (simulate's
    # tol_accept, f32 default 5e-2) sits between the measured f32
    # stagnation floor of healthy solves (<= 3.3e-2) and garbage (>= 1.3e-1).
    value = jnp.where(res.valid & res.cg_ok, value, 0.0)
    return value, dict(model=m, wsats=res.wsats, ledgr=ledgr, result=res)


def npv_value(model: ResSim, cfg: NPVConfig = NPVConfig(), wsat0=None, **params):
    """Scalar-only `npv` — the form used inside batched EnOpt objectives."""
    return npv(model, cfg, wsat0, **params)[0]
