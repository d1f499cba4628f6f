"""Lane-packed member layout (ops/packed.py): exact equivalence with the
per-member operators. P members share one lane row; zero seam faces must
make cross-member leakage exactly zero."""

import jax
import jax.numpy as jnp
import numpy as np

from historymatching_tpu.ops import packed as pk
from historymatching_tpu.ops.stencil import (
    face_fluxes,
    stencil_diag_nopin,
    stencil_matvec,
    transmissibilities,
)

B, NX, NY, P = 4, 16, 8, 2


def _systems(key):
    ks = jax.random.split(key, B)
    Ks = jnp.stack([jnp.exp(2 * jax.random.normal(k, (NX, NY))) for k in ks])
    TX, TY = jax.vmap(lambda K: transmissibilities(K, K, 0.1, 0.1))(Ks)
    diag = jax.vmap(stencil_diag_nopin)(TX, TY)
    diag = diag.at[:, 0, 0].add(jnp.mean(diag, axis=(1, 2)))
    return TX, TY, diag


def test_pack_roundtrip(key):
    x = jax.random.normal(key, (B, NX, NY))
    assert np.allclose(np.asarray(pk.unpack_cells(pk.pack_cells(x, P), P)), x)


def test_packed_matvec_matches_per_member(key):
    k1, k2 = jax.random.split(key)
    TX, TY, diag = _systems(k1)
    p = jax.random.normal(k2, (B, NX, NY))
    ref = jax.vmap(stencil_matvec)(TX, TY, diag, p)
    out = pk.stencil_matvec_packed(
        pk.pack_faces_x(TX, P), pk.pack_faces_y(TY, P),
        pk.pack_cells(diag, P), pk.pack_cells(p, P),
    )
    assert np.allclose(np.asarray(pk.unpack_cells(out, P)), np.asarray(ref),
                       atol=1e-12)


def test_packed_fluxes_match(key):
    k1, k2 = jax.random.split(key)
    TX, TY, diag = _systems(k1)
    p = jax.random.normal(k2, (B, NX, NY))
    Fx_ref, Fy_ref = jax.vmap(face_fluxes)(TX, TY, p)  # (B, NX+1, NY), (B, NX, NY+1)
    Fxp, Fyp = pk.face_fluxes_packed(
        pk.pack_faces_x(TX, P), pk.pack_faces_y(TY, P), pk.pack_cells(p, P)
    )
    Fxp = np.asarray(pk.unpack_cells(Fxp, P))  # row i = flux across (i, i+1)
    Fyp = np.asarray(pk.unpack_cells(Fyp, P))
    assert np.allclose(Fxp[:, :-1, :], np.asarray(Fx_ref)[:, 1:-1, :], atol=1e-12)
    assert np.allclose(Fxp[:, -1, :], 0.0)
    assert np.allclose(Fyp[:, :, :-1], np.asarray(Fy_ref)[:, :, 1:-1], atol=1e-12)
    assert np.allclose(Fyp[:, :, -1], 0.0)


def test_grouped_vdot(key):
    k1, k2 = jax.random.split(key)
    u = jax.random.normal(k1, (B, NX, NY))
    v = jax.random.normal(k2, (B, NX, NY))
    ref = jnp.sum(u * v, axis=(1, 2))  # per member
    out = pk.grouped_vdot(pk.pack_cells(u, P), pk.pack_cells(v, P), P)
    out_members = pk.unpack_cells(out, P)
    for b in range(B):
        assert np.allclose(np.asarray(out_members[b]), float(ref[b]), atol=1e-9)


def test_lane_group_masks():
    masks = pk.lane_group_masks((3, NX, P * NY), P, jnp.float32)
    assert len(masks) == P
    total = sum(np.asarray(m, dtype=int) for m in masks)
    assert (total == 1).all()


def _hier_members(key, Nx=16, Ny=8):
    from historymatching_tpu.ops.multigrid import build_hierarchy_5pt

    ks = jax.random.split(key, B)
    Ks = jnp.stack([jnp.exp(2 * jax.random.normal(k, (Nx, Ny))) for k in ks])

    def build(K):
        TX, TY = transmissibilities(K, K, 0.1, 0.1)
        dnp = stencil_diag_nopin(TX, TY)
        diag = dnp.at[0, 0].add(jnp.mean(dnp))
        return build_hierarchy_5pt(TX, TY, diag)

    return jax.vmap(build)(Ks)


def test_packed_vcycle_matches_per_member(key):
    from historymatching_tpu.ops.multigrid import (
        coarse_inverse,
        pack_hierarchy,
        vcycle_apply,
        vcycle_apply_packed,
    )

    k1, k2 = jax.random.split(key)
    hier = _hier_members(k1)
    b = jax.random.normal(k2, (B, 16, 8))

    def per_member(hier_1, b1):
        levels = [tuple(x) for x in hier_1]
        Ainv = coarse_inverse(levels)
        return vcycle_apply(levels, Ainv, b1)

    ref = jax.vmap(per_member)(hier, b)
    packed_hier, Ainv3p = pack_hierarchy(hier, P)
    out = vcycle_apply_packed(packed_hier, Ainv3p, pk.pack_cells(b, P), P)
    out = pk.unpack_cells(out, P)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-8), \
        np.abs(np.asarray(out) - np.asarray(ref)).max()


def test_packed_pcg_solves_and_matches(key):
    from historymatching_tpu.ops.cg import pcg, pcg_batched
    from historymatching_tpu.ops.multigrid import pack_hierarchy, vcycle_apply_packed

    k1, k2 = jax.random.split(key)
    hier = _hier_members(k1)
    TX0, TY0, diag0 = (hier[0][0], hier[0][1], hier[0][2])  # fine level, (B,...)
    b = jax.random.normal(k2, (B, 16, 8))
    b = b - b.mean(axis=(1, 2), keepdims=True)  # compatible RHS

    packed_hier, Ainv3p = pack_hierarchy(hier, P)
    TXf, TYf, diagp = packed_hier[0]
    bp = pk.pack_cells(b, P)
    mv = lambda x: pk.stencil_matvec_packed(TXf, TYf, diagp, x)
    Minv = lambda r: vcycle_apply_packed(packed_hier, Ainv3p, r, P)
    xp, k, rel = pcg_batched(mv, bp, Minv=Minv, tol=1e-9, maxiter=400,
                             restart_every=8, patience_iters=400,
                             group_lanes=P)
    x = pk.unpack_cells(xp, P)
    # each member's system is solved
    for m in range(B):
        r = np.asarray(b[m] - stencil_matvec(hier[0][0][m], hier[0][1][m],
                                             hier[0][2][m], x[m]))
        assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b[m])) < 1e-7, m
    # grouped rel_res extraction: (B/P, 1, W) -> per member
    rel = np.asarray(rel)
    Ny_ = 8
    rel_members = rel[:, 0, ::Ny_].reshape(-1)
    assert rel_members.shape == (B,)
    assert (rel_members < 1e-7).all()
