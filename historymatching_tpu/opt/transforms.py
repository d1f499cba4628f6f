"""Control-variable transforms and constraints for EnOpt.

jnp re-designs of the reference's transforms (SURVEY.md C2c): all are pure,
jit/vmap-safe functions (no in-place mutation), so whole perturbation
ensembles go through them batched.
"""

from __future__ import annotations

import jax.numpy as jnp


def sigmoid(x, height, width=1.0):
    """Centered sigmoid: S(0) = height/2, S(width) ~ 0.73*height
    (reference Optimise.py:573-575)."""
    return height / (1.0 + jnp.exp(-x / width))


def coordinate_transform(xys, Lx, Ly):
    """Map R -> (0, L) per dimension, origin -> domain centre
    (reference Optimise.py:578-584). Works on (..., 2k) flat xy vectors."""
    xys = jnp.asarray(xys, dtype=jnp.result_type(float))
    shape = xys.shape
    xy2d = xys.reshape((-1, 2))
    xy2d = jnp.stack([sigmoid(xy2d[:, 0], Lx), sigmoid(xy2d[:, 1], Ly)], axis=1)
    return xy2d.reshape(shape)


def rate_transform(pre_rates, nWell, nInterval, nTime, rate_min=0.1):
    """Map R -> [0, inf): exp, snap-below-`rate_min` to 0, expand
    `nInterval` piecewise-constant intervals to `nTime` steps
    (reference Optimise.py:757-767). Input is flat (nWell*nInterval,)."""
    duration = -(-nTime // nInterval)  # ceil
    rates = jnp.exp(jnp.asarray(pre_rates))
    rates = jnp.where(rates < rate_min, 0.0, rates)
    rates = rates.reshape((nWell, nInterval))
    rates = jnp.repeat(rates, duration, axis=1)[:, :nTime]
    return rates


def equalize(rates, nWell):
    """Distribute the total rate equally among `nWell`
    (reference Optimise.py:638-640)."""
    rates = jnp.atleast_2d(jnp.asarray(rates))
    return jnp.tile(rates.sum(0) / nWell, (nWell, 1))


def balance_rates(inj, prd, eps=1e-30):
    """Balance totals at each time step by scaling the larger side down
    (reference Optimise.py:743-746). Returns (inj, prd)."""
    inj = jnp.atleast_2d(jnp.asarray(inj))
    prd = jnp.atleast_2d(jnp.asarray(prd))
    I = inj.sum(0)  # noqa: E741
    Pt = prd.sum(0)
    inj = jnp.where(Pt < I, inj * Pt / jnp.maximum(I, eps), inj)
    prd = jnp.where(I < Pt, prd * I / jnp.maximum(Pt, eps), prd)
    return inj, prd
