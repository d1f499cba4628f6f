"""Mesh/sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from historymatching_tpu.parallel.mesh import ENS_AXIS, ens_mesh, shard_ens
from historymatching_tpu.parallel.runner import forward_model, obs_ens_fn, perm_transf, set_perm
from tests.test_sim import default_model


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_perm_transf_and_set_perm(key):
    m = default_model(Nx=6, Ny=6)
    x = jax.random.normal(key, (m.Nxy,))
    m2 = set_perm(m, x)
    assert m2.K.shape == (2, 6, 6)
    assert np.allclose(np.asarray(m2.K[0]), np.asarray(perm_transf(x)).reshape(6, 6))
    assert np.allclose(np.asarray(m2.K[0]), np.asarray(m2.K[1]))


def test_forward_model_shapes(key):
    m = default_model(Nx=8, Ny=8)
    perm = 0.3 * jax.random.normal(key, (4, m.Nxy))
    wsats, prods = forward_model(m, perm, dt=0.025, nTime=3)
    assert wsats.shape == (4, 4, m.Nxy)
    assert prods.shape == (4, 3, 4)


def test_forward_model_sharded_matches_unsharded(key):
    m = default_model(Nx=8, Ny=8)
    N = 8
    perm = 0.3 * jax.random.normal(key, (N, m.Nxy))
    mesh = ens_mesh()
    w0, p0 = forward_model(m, perm, dt=0.025, nTime=3)
    perm_sh = shard_ens(perm, mesh)
    w1, p1 = forward_model(m, perm_sh, dt=0.025, nTime=3, mesh=mesh)
    assert np.allclose(np.asarray(w1), np.asarray(w0), atol=1e-9)
    assert np.allclose(np.asarray(p1), np.asarray(p0), atol=1e-9)
    # outputs keep the member axis sharded
    assert ENS_AXIS in str(w1.sharding)


def test_forward_model_restart_batched_wsat0(key):
    m = default_model(Nx=8, Ny=8)
    k1, k2 = jax.random.split(key)
    perm = 0.3 * jax.random.normal(k1, (3, m.Nxy))
    w0 = jnp.clip(0.5 + 0.1 * jax.random.normal(k2, (3, m.Nxy)), 0, 1)
    wsats, prods = forward_model(m, perm, w0, dt=0.025, nTime=2)
    assert np.allclose(np.asarray(wsats[:, 0]), np.asarray(w0))


def test_forward_model_chunked_matches(key):
    """Member-chunked execution (the CPU-f64 parity-reference accelerator)
    must reproduce the one-batch vmap exactly: vmap's while_loop batching
    masks converged members, so a member's iterates never depend on its
    batchmates. Covers a ragged final chunk and batched restart states."""
    m = default_model(Nx=8, Ny=8)
    k1, k2 = jax.random.split(key)
    N = 7
    perm = 0.5 * jax.random.normal(k1, (N, m.Nxy))
    w0, p0 = forward_model(m, perm, dt=0.025, nTime=4)
    for chunk in (1, 3):
        w1, p1 = forward_model(m, perm, dt=0.025, nTime=4, chunk=chunk)
        assert np.allclose(np.asarray(w1), np.asarray(w0), atol=1e-12), chunk
        assert np.allclose(np.asarray(p1), np.asarray(p0), atol=1e-12), chunk
    ws0 = jnp.clip(0.5 + 0.1 * jax.random.normal(k2, (N, m.Nxy)), 0, 1)
    w0, p0 = forward_model(m, perm, ws0, dt=0.025, nTime=2)
    w1, p1 = forward_model(m, perm, ws0, dt=0.025, nTime=2, chunk=2)
    assert np.allclose(np.asarray(w1), np.asarray(w0), atol=1e-12)
    assert np.allclose(np.asarray(p1), np.asarray(p0), atol=1e-12)


def test_forward_model_indivisible_raises(key):
    m = default_model(Nx=8, Ny=8)
    perm = jnp.zeros((5, m.Nxy))
    with pytest.raises(ValueError, match="divisible"):
        forward_model(m, perm, dt=0.025, nTime=2, mesh=ens_mesh())


def test_obs_ens_fn(key):
    m = default_model(Nx=8, Ny=8)
    fn = obs_ens_fn(m, dt=0.025, nTime=3)
    E = 0.3 * jax.random.normal(key, (2, m.Nxy))
    obs = fn(E)
    assert obs.shape == (2, 3 * 4)


def test_sharded_es_update(key):
    """ens_update0 on a member-sharded ensemble: GSPMD turns the ensemble
    moments into cross-chip collectives; result must match unsharded."""
    from historymatching_tpu.da.update import ens_update0

    k1, k2, k3 = jax.random.split(key, 3)
    N, M, p = 16, 20, 6
    E = jax.random.normal(k1, (N, M))
    obs_ens = E[:, :p] * 0.5
    obs = jnp.ones(p)
    perturbs = jax.random.normal(k2, (N, p))
    decorr = jnp.eye(p)
    ref = np.asarray(ens_update0(E, obs_ens, obs, perturbs, decorr))
    mesh = ens_mesh()
    Es = shard_ens(E, mesh)
    obs_s = shard_ens(obs_ens, mesh)
    pert_s = shard_ens(perturbs, mesh)
    got = np.asarray(jax.jit(ens_update0)(Es, obs_s, obs, pert_s, decorr))
    assert np.allclose(got, ref, atol=1e-9)
