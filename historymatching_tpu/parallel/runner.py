"""Ensemble forward-model runners: vmap in-chip, shard_map across chips.

Replaces the reference's process-pool fan-out (`tools/utils.apply`,
SURVEY.md C8, §3.2): no pickling, no deepcopy-per-member — the member axis is
a leading array dimension, the composite model (set_perm -> simulate ->
observe) is one compiled function, and cross-chip scaling is a `shard_map`
over the "ens" mesh axis (zero communication: members are independent).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from historymatching_tpu.models.ressim import ResSim, simulate
from historymatching_tpu.parallel.mesh import ENS_AXIS
from jax.sharding import PartitionSpec as P

try:  # JAX >= 0.6 stable API
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_exp

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_exp(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


def perm_transf(x):
    """Pre-permeability transform: 0.1 + exp(5 x)
    (reference HistoryMatch.py:137-138).

    The exponent is capped at 80 (K <= 5.5e34): iterative methods (IES/ILES)
    can overshoot members into a regime where exp overflows float32 to inf
    and the whole run NaNs — the reference never sees this because it runs
    float64. Beyond e^80 the simulation is physically meaningless anyway, so
    the cap only affects already-divergent members (and keeps them finite so
    later iterations can pull them back)."""
    return 0.1 + jnp.exp(jnp.minimum(5.0 * x, 80.0))


def set_perm(model: ResSim, log_perm_array, transf=perm_transf):
    """Apply a (pre-)permeability field to the model (both K components),
    functionally (reference HistoryMatch.py:160-164)."""
    p = transf(log_perm_array).reshape(model.shape)
    return model.replace(K=jnp.stack([p, p]))


def prod_inds(model: ResSim):
    """Producer cell indices — the observation operator's gather targets
    (reference HistoryMatch.py:209-213)."""
    return model.xy2ind(model.prd_xy[:, 0], model.prd_xy[:, 1])


def _comp1(model, pre_perm, wsat0, dt, nTime, transf, sim_kwargs, keep_wsats,
           p_init=None, keep_pressures=False):
    """Composite forward model for one member (reference comp1,
    HistoryMatch.py:358-364): set params -> simulate -> observe.

    With keep_wsats=False only the production series (and the final state,
    for restarts) is materialized — and not merely dropped after the fact:
    `simulate(keep_wsats=False)` never stacks the (nTime, Nxy) history in
    its scan at all; the observation series comes from `SimResult.prd_sats`
    (4 floats/step emitted in-scan). The full history is a large HBM
    buffer at N=1000 (reference notes the same: state emitted 'only ...
    for future prediction', HistoryMatch.py:370-374)."""
    m = set_perm(model, pre_perm, transf)
    res = simulate(m, wsat0, dt, nTime, p_init=p_init, keep_wsats=keep_wsats,
                   keep_pressures=keep_pressures, **sim_kwargs)
    prods = res.prd_sats  # (nTime, nPrd) == wsats[1:][:, prod_inds(m)]
    wsats = res.wsats if keep_wsats else res.wsats[-1:]  # else: restartable final state
    if keep_pressures:
        return wsats, prods, res.pressures
    return wsats, prods


@partial(
    jax.jit,
    static_argnames=("dt", "nTime", "transf", "sim_kwargs_t", "wsat0_batched", "keep_wsats",
                     "keep_pressures"),
)
def _forward_vmap(model, perm_ens, wsat0, dt, nTime, transf, sim_kwargs_t, wsat0_batched,
                  keep_wsats=True, p_init=None, keep_pressures=False):
    sim_kwargs = dict(sim_kwargs_t)
    f = lambda p, w, pi: _comp1(model, p, w, dt, nTime, transf, sim_kwargs,  # noqa: E731
                                keep_wsats, pi, keep_pressures)
    return jax.vmap(f, in_axes=(0, 0 if wsat0_batched else None,
                                None if p_init is None else 0))(
        perm_ens, wsat0, p_init)


def forward_model(model, perm_ens, wsat0=None, dt=0.025, nTime=40, *, transf=perm_transf,
                  mesh=None, keep_wsats=True, chunk=None, p_init=None,
                  keep_pressures=False, **sim_kwargs):
    """Run the ensemble forward model.

    Parameters mirror the reference's `forward_model(perm_ens, wsat0)`
    (HistoryMatch.py:383-387): `perm_ens` (N, Nxy) pre-permeability fields;
    `wsat0` either one shared state (Nxy,) or per-member states (N, Nxy) for
    restarts. Returns (wsats (N, nTime+1, Nxy), prods (N, nTime, nPrd)).

    With `mesh`, members are sharded over the "ens" axis via shard_map
    (N must be divisible by the mesh size); otherwise a single-device vmap.

    `chunk` (single-device path only): run members in host-level batches of
    `chunk` instead of one lockstep vmap. Per-member results are identical —
    vmap's while_loop batching masks converged members, so batching changes
    only how much masked work runs, never a member's own iterates
    (tests/test_parallel.py::test_forward_model_chunked_matches). With the
    per-member CG iteration counts heavy-tailed (stragglers run 5-10x the
    median), a lockstep batch pays `N * max(iters)`; chunks pay
    `sum over chunks of chunk * max(iters in chunk)`. Members are grouped by
    a permeability-contrast proxy so stragglers land in the same chunk
    (order is restored in the outputs). This is the CPU-f64 parity-reference
    accelerator; the TPU bench path instead uses the Pallas two-pass
    straggler recook.

    `p_init` ((N, nTime, Nxy), optional) / `keep_pressures`: per-member
    pressure-trajectory warm starts (see `simulate`); with
    `keep_pressures` the return gains a third element, the (N, nTime, Nxy)
    pressure trajectories — the ES-MDA cross-pass warm-start loop feeds
    them back as the next pass's `p_init`."""
    perm_ens = jnp.atleast_2d(perm_ens)
    if wsat0 is None:
        wsat0 = jnp.zeros(model.Nxy, dtype=perm_ens.dtype)
    wsat0 = jnp.asarray(wsat0)
    batched_w = wsat0.ndim == 2
    kw_t = tuple(sorted(sim_kwargs.items()))

    if mesh is None:
        N = perm_ens.shape[0]
        if chunk is None or chunk >= N:
            return _forward_vmap(model, perm_ens, wsat0, dt, nTime, transf, kw_t,
                                 batched_w, keep_wsats, p_init, keep_pressures)
        import numpy as np

        # hardness proxy: the field's max pre-perm (sets the K contrast that
        # drives CG iteration counts); descending so stragglers share chunks
        order = np.argsort(-np.asarray(jnp.max(perm_ens, axis=1)), kind="stable")
        inv = np.argsort(order)
        outs = []
        for i in range(0, N, chunk):
            idx = order[i:i + chunk]
            w = wsat0[idx] if batched_w else wsat0
            pi = None if p_init is None else p_init[idx]
            outs.append(_forward_vmap(model, perm_ens[idx], w, dt, nTime, transf,
                                      kw_t, batched_w, keep_wsats, pi,
                                      keep_pressures))
        return tuple(jnp.concatenate(parts)[inv] for parts in zip(*outs))

    n_dev = mesh.devices.size
    if perm_ens.shape[0] % n_dev:
        raise ValueError(f"N={perm_ens.shape[0]} not divisible by mesh size {n_dev}")

    n_out = 3 if keep_pressures else 2
    out_specs = tuple([P(ENS_AXIS)] * n_out)
    w_spec = P(ENS_AXIS) if batched_w else P()
    if p_init is None:
        def local(perm_shard, w_shard):
            return _forward_vmap(model, perm_shard, w_shard, dt, nTime, transf,
                                 kw_t, batched_w, keep_wsats, None, keep_pressures)

        fm = shard_map(local, mesh, (P(ENS_AXIS), w_spec), out_specs)
        return jax.jit(fm)(perm_ens, wsat0)

    def local_p(perm_shard, w_shard, p_shard):
        return _forward_vmap(model, perm_shard, w_shard, dt, nTime, transf,
                             kw_t, batched_w, keep_wsats, p_shard, keep_pressures)

    fm = shard_map(local_p, mesh, (P(ENS_AXIS), w_spec, P(ENS_AXIS)), out_specs)
    return jax.jit(fm)(perm_ens, wsat0, p_init)


def ensemble_simulate(model, perm_ens, wsat0=None, dt=0.025, nTime=40, **kw):
    """Alias with the package's preferred name."""
    return forward_model(model, perm_ens, wsat0, dt, nTime, **kw)


def obs_ens_fn(model, dt, nTime, wsat0=None, mesh=None, nTime_axis_flat=True):
    """Build the `obs_ens` callable used by IES/ILES/ES-MDA: ensemble ->
    flattened production series (N, nTime*nPrd) (reference HistoryMatch.py:958-959)."""

    def fn(E):
        _, prods = forward_model(model, E, wsat0, dt, nTime, mesh=mesh, keep_wsats=False)
        if nTime_axis_flat:
            return prods.reshape(prods.shape[0], -1)
        return prods

    return fn
