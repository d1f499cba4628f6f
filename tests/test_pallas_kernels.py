"""Pallas kernel equivalence tests (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from historymatching_tpu.models.ressim import transport_step
from historymatching_tpu.ops.transport_pallas import transport_substeps_pallas
from tests.test_sim import default_model


def test_transport_pallas_matches_xla(key):
    m = default_model(Nx=12, Ny=12)
    g = m.grid
    k1, k2, k3 = jax.random.split(key, 3)
    s = jnp.clip(0.4 + 0.2 * jax.random.normal(k1, g.shape), 0, 1).astype(jnp.float32)
    Fx = (0.1 * jax.random.normal(k2, (g.Nx + 1, g.Ny))).astype(jnp.float32)
    Fx = Fx.at[0].set(0).at[-1].set(0)
    Fy = (0.1 * jax.random.normal(k3, (g.Nx, g.Ny + 1))).astype(jnp.float32)
    Fy = Fy.at[:, 0].set(0).at[:, -1].set(0)
    q = jnp.zeros(g.shape, jnp.float32).at[6, 6].set(1.0).at[1, 1].set(-1.0)
    dt = 0.01

    s_xla, n_sub = transport_step(m, s, Fx, Fy, q, dt, use_pallas=False)
    fl = m.fluid
    pv = g.h2
    dts_pv = (dt / n_sub.astype(s.dtype)) / pv
    s_pl = transport_substeps_pallas(
        s, Fx, Fy, q, dts_pv, n_sub, (fl.vw, fl.vo, fl.swc, fl.sor), interpret=True
    )
    assert np.allclose(np.asarray(s_pl), np.asarray(s_xla), atol=1e-6)


def test_transport_pallas_under_vmap(key):
    m = default_model(Nx=8, Ny=8)
    g = m.grid
    B = 3
    ks = jax.random.split(key, 3)
    s = jnp.clip(0.4 + 0.2 * jax.random.normal(ks[0], (B, *g.shape)), 0, 1).astype(jnp.float32)
    Fx = (0.1 * jax.random.normal(ks[1], (B, g.Nx + 1, g.Ny))).astype(jnp.float32)
    Fy = (0.1 * jax.random.normal(ks[2], (B, g.Nx, g.Ny + 1))).astype(jnp.float32)
    q = jnp.zeros((B, *g.shape), jnp.float32)
    dts_pv = jnp.full((B,), 0.01, jnp.float32)
    n_sub = jnp.array([1, 3, 5], jnp.int32)
    fl = m.fluid
    fl_t = (fl.vw, fl.vo, fl.swc, fl.sor)

    batched = jax.vmap(
        lambda s1, fx, fy, q1, d1, n1: transport_substeps_pallas(
            s1, fx, fy, q1, d1, n1, fl_t, interpret=True
        )
    )(s, Fx, Fy, q, dts_pv, n_sub)
    for b in range(B):
        single = transport_substeps_pallas(
            s[b], Fx[b], Fy[b], q[b], dts_pv[b], n_sub[b], fl_t, interpret=True
        )
        assert np.allclose(np.asarray(batched[b]), np.asarray(single), atol=1e-7)


def test_pressure_pallas_matches_xla(key):
    import jax

    from historymatching_tpu.models.ressim import relperm
    from historymatching_tpu.ops.cg import pcg
    from historymatching_tpu.ops.multigrid import build_hierarchy, coarse_inverse, vcycle_solver
    from historymatching_tpu.ops.pressure_pallas import pressure_solve_pallas
    from historymatching_tpu.ops.stencil import (
        stencil_diag_nopin,
        stencil_matvec,
        transmissibilities,
    )

    m = default_model(Nx=16, Ny=16)
    g = m.grid
    perm = jax.random.normal(key, (g.Nxy,)).astype(jnp.float32)
    K = (0.1 + jnp.exp(3 * perm)).reshape(g.shape)
    TX, TY = transmissibilities(K, K, g.hx, g.hy)
    dnp = stencil_diag_nopin(TX, TY)
    pin = jnp.mean(dnp)
    diag = dnp.at[0, 0].add(pin)
    q = jnp.zeros(g.shape, jnp.float32).at[8, 8].set(1.0).at[2, 2].set(-1.0)
    hierarchy = build_hierarchy(TX, TY, pin)
    Nc, Mc = hierarchy[-1][2].shape
    Ainv3 = coarse_inverse(hierarchy).reshape(-1, Nc, Mc)
    hier_flat = tuple(x for lvl in hierarchy for x in lvl)

    p_pl, it_pl, rel_pl = pressure_solve_pallas(
        hier_flat, Ainv3, q, jnp.zeros_like(q), jnp.ones_like(q), tol=1e-4,
        maxiter=256, interpret=True
    )
    mv = lambda x: stencil_matvec(TX, TY, diag, x)
    p_x, it_x, rel_x = pcg(
        mv, q, x0=jnp.zeros_like(q), Minv=vcycle_solver(hierarchy),
        tol=1e-4, maxiter=256, restart_every=8,
    )
    # f32 op-ordering differs between interpret and XLA paths, so iterate
    # counts may differ slightly; both must deliver solutions of the target
    # quality and agree to solver tolerance.
    nq = np.linalg.norm(np.asarray(q))
    for p_sol in (p_pl, p_x):
        r = np.asarray(q - mv(p_sol))
        assert np.linalg.norm(r) / nq < 1e-3
    scale = np.abs(np.asarray(p_x)).max()
    assert np.allclose(np.asarray(p_pl), np.asarray(p_x), atol=2e-3 * scale)


def test_pcg_batched_matches_single(key):
    """Hand-batched pcg (scalar while-cond, for Mosaic) == per-member pcg."""
    from historymatching_tpu.ops.cg import pcg, pcg_batched
    from historymatching_tpu.ops.multigrid import build_hierarchy, coarse_inverse, vcycle_solver
    from historymatching_tpu.ops.stencil import stencil_diag_nopin, stencil_matvec, transmissibilities

    m = default_model(Nx=16, Ny=16)
    g = m.grid
    B = 4
    perm = jax.random.normal(key, (B, g.Nxy)).astype(jnp.float32)
    q = jnp.zeros(g.shape, jnp.float32).at[8, 8].set(1.0).at[2, 2].add(-1.0)

    def build(p):
        K = (0.1 + jnp.exp(3 * p)).reshape(g.shape)
        TX, TY = transmissibilities(K, K, g.hx, g.hy)
        dnp = stencil_diag_nopin(TX, TY)
        pin = jnp.mean(dnp)
        return TX, TY, dnp.at[0, 0].add(pin), pin

    TXb, TYb, diagb, pinb = jax.vmap(build)(perm)

    mv_b = lambda x: stencil_matvec(TXb, TYb, diagb, x)
    qb = jnp.tile(q, (B, 1, 1))
    xb, itb, relb = pcg_batched(
        mv_b, qb, Minv=lambda r: r / diagb, tol=1e-4, maxiter=1024, restart_every=8
    )
    for b in range(B):
        mv1 = lambda x: stencil_matvec(TXb[b], TYb[b], diagb[b], x)
        # batched solution solves each member's system to tolerance
        r = np.asarray(q - mv1(xb[b]))
        assert np.linalg.norm(r) / np.linalg.norm(np.asarray(q)) < 5e-3


def test_transport_blocked_matches_per_member(key):
    """Blocked transport kernel (per-member freeze masks, block max substeps)
    == per-member kernel, including ragged substep counts and the
    pad-to-block path of the custom_vmap rule."""
    from historymatching_tpu.ops.transport_pallas import (
        transport_substeps_pallas_batched,
        transport_substeps_vmappable,
    )

    m = default_model(Nx=8, Ny=8)
    g = m.grid
    B = 8
    ks = jax.random.split(key, 3)
    s = jnp.clip(0.4 + 0.2 * jax.random.normal(ks[0], (B, *g.shape)), 0, 1).astype(jnp.float32)
    # Physical fluxes carry ZERO boundary faces (face_fluxes always emits
    # them); the packed lane layout relies on that invariant, so synthetic
    # inputs must honor it too.
    Fx = (0.1 * jax.random.normal(ks[1], (B, g.Nx + 1, g.Ny))).astype(jnp.float32)
    Fx = Fx.at[:, 0].set(0).at[:, -1].set(0)
    Fy = (0.1 * jax.random.normal(ks[2], (B, g.Nx, g.Ny + 1))).astype(jnp.float32)
    Fy = Fy.at[:, :, 0].set(0).at[:, :, -1].set(0)
    q = jnp.zeros((B, *g.shape), jnp.float32)
    dts_pv = jnp.linspace(0.005, 0.02, B).astype(jnp.float32)
    n_sub = jnp.array([1, 3, 5, 2, 8, 1, 4, 7], jnp.int32)  # ragged
    fl = m.fluid
    fl_t = (fl.vw, fl.vo, fl.swc, fl.sor)

    blocked = transport_substeps_pallas_batched(
        s, Fx, Fy, q, dts_pv, n_sub, fl_t, block=4, interpret=True
    )
    for b in range(B):
        single = transport_substeps_pallas(
            s[b], Fx[b], Fy[b], q[b], dts_pv[b], n_sub[b], fl_t, interpret=True
        )
        assert np.allclose(np.asarray(blocked[b]), np.asarray(single), atol=1e-7), b

    # custom_vmap rule with padding (B=6 not divisible by block=4)
    vm = jax.vmap(
        lambda s1, fx, fy, q1, d1, n1: transport_substeps_vmappable(
            s1, fx, fy, q1, d1, n1, fluid_t=fl_t, block=4, interpret=True
        )
    )(s[:6], Fx[:6], Fy[:6], q[:6], dts_pv[:6], n_sub[:6])
    for b in range(6):
        single = transport_substeps_pallas(
            s[b], Fx[b], Fy[b], q[b], dts_pv[b], n_sub[b], fl_t, interpret=True
        )
        assert np.allclose(np.asarray(vm[b]), np.asarray(single), atol=1e-7), b


def test_pressure_packed_kernel_interpret(key):
    """Lane-packed pressure kernel (interpret mode) == per-member XLA pcg."""
    from historymatching_tpu.ops.cg import pcg
    from historymatching_tpu.ops.multigrid import (
        build_hierarchy_5pt,
        coarse_inverse,
        vcycle_solver,
    )
    from historymatching_tpu.ops.packed import pack_cells, unpack_cells
    from historymatching_tpu.ops.pressure_pallas import (
        _pack_args,
        pressure_solve_pallas_packed,
    )
    from historymatching_tpu.ops.stencil import (
        stencil_diag_nopin,
        stencil_matvec,
        transmissibilities,
    )

    Nx, Ny, P, B = 16, 16, 8, 8
    ks = jax.random.split(key, B)
    Ks = jnp.stack(
        [jnp.exp(2 * jax.random.normal(k, (Nx, Ny))).astype(jnp.float32) for k in ks]
    )

    def build(K):
        TX, TY = transmissibilities(K, K, 0.1, 0.1)
        dnp = stencil_diag_nopin(TX, TY)
        diag = dnp.at[0, 0].add(jnp.mean(dnp))
        hier = build_hierarchy_5pt(TX, TY, diag)
        Nc, Mc = hier[-1][2].shape
        Ainv3 = coarse_inverse(hier).reshape(-1, Nc, Mc)
        return hier, Ainv3, diag

    hier_b, Ainv_b, diag_b = jax.vmap(build)(Ks)
    hier_flat_b = tuple(x for lvl in hier_b for x in lvl)
    q = jnp.zeros((B, Nx, Ny), jnp.float32).at[:, 8, 8].set(1.0).at[:, 2, 2].set(-1.0)
    w = jnp.sqrt(diag_b)

    hier_p, Ainv_p, q_p, p0_p, w_p = _pack_args(
        hier_flat_b, Ainv_b, q, jnp.zeros_like(q), w, P
    )
    pp, it_p, rel_p = pressure_solve_pallas_packed(
        hier_p, Ainv_p, q_p, p0_p, w_p, P, tol=1e-4, maxiter=256,
        block_pairs=1, interpret=True,
    )
    p = np.asarray(unpack_cells(pp, P))
    rel_members = np.asarray(rel_p)[:, 0, ::Ny].reshape(-1)

    for b in range(B):
        hier_1 = [tuple(x[b] for x in lvl) for lvl in hier_b]
        mv = lambda x: stencil_matvec(hier_1[0][0], hier_1[0][1], hier_1[0][2], x)
        p_ref, _, rel_ref = pcg(
            mv, q[b], x0=jnp.zeros_like(q[b]), Minv=vcycle_solver(hier_1),
            tol=1e-4, maxiter=256, restart_every=8, metric_weight=w[b],
        )
        r = np.asarray(q[b] - mv(jnp.asarray(p[b])))
        nq = np.linalg.norm(np.asarray(q[b]))
        assert np.linalg.norm(r) / nq < 1e-3, (b, np.linalg.norm(r) / nq)
        assert rel_members[b] < 1e-3
        scale = np.abs(np.asarray(p_ref)).max()
        assert np.allclose(p[b], np.asarray(p_ref), atol=5e-3 * scale), b


def test_transport_packed_matches_per_member(key):
    """Lane-packed transport kernel == per-member kernel (interpret mode),
    incl. ragged substep counts and zero cross-member leakage."""
    from historymatching_tpu.ops.transport_pallas import (
        transport_substeps_pallas,
        transport_substeps_pallas_packed,
    )

    m = default_model(Nx=8, Ny=8)
    g = m.grid
    P, bp = 16, 1
    B = P * bp
    ks = jax.random.split(key, 3)
    s = jnp.clip(0.4 + 0.2 * jax.random.normal(ks[0], (B, *g.shape)), 0, 1).astype(jnp.float32)
    Fx = (0.1 * jax.random.normal(ks[1], (B, g.Nx + 1, g.Ny))).astype(jnp.float32)
    Fx = Fx.at[:, 0].set(0).at[:, -1].set(0)
    Fy = (0.1 * jax.random.normal(ks[2], (B, g.Nx, g.Ny + 1))).astype(jnp.float32)
    Fy = Fy.at[:, :, 0].set(0).at[:, :, -1].set(0)
    q = jnp.zeros((B, *g.shape), jnp.float32).at[:, 4, 4].set(1.0).at[:, 1, 1].set(-1.0)
    dts_pv = jnp.linspace(0.005, 0.02, B).astype(jnp.float32)
    n_sub = (1 + jnp.arange(B, dtype=jnp.int32) * 3) % 9 + 1  # ragged
    fl = m.fluid
    fl_t = (fl.vw, fl.vo, fl.swc, fl.sor)

    packed = transport_substeps_pallas_packed(
        s, Fx, Fy, q, dts_pv, n_sub, fl_t, P, block_pairs=bp, interpret=True
    )
    for b in range(B):
        single = transport_substeps_pallas(
            s[b], Fx[b], Fy[b], q[b], dts_pv[b], n_sub[b], fl_t, interpret=True
        )
        assert np.allclose(np.asarray(packed[b]), np.asarray(single), atol=1e-7), b


def test_pressure_strategy_knobs_alter_trace(key):
    """two_pass / refine / packed are explicit static kwargs threaded from
    `simulate` down to the custom_vmap rule (round-2 ADVICE: the old env-var
    reads happened at trace time, so flipping a knob between same-shape
    calls was silently ignored by the jit cache). Flipping a knob must
    change the traced program — verified structurally on the jaxpr, no
    execution/lowering needed (the Mosaic path never compiles on CPU)."""
    from historymatching_tpu.models.ressim import simulate
    from historymatching_tpu.parallel.runner import set_perm

    m = default_model(Nx=32, Ny=32)
    N = 128  # >= 2 Mosaic programs at P=4, block_pairs=16 -> two-pass engages
    perm = jax.random.normal(key, (N, m.Nxy)).astype(jnp.float32)
    w0 = jnp.zeros(m.Nxy, jnp.float32)

    def trace(**knobs):
        def one(p):
            r = simulate(set_perm(m, p), w0, 0.025, 2, use_pallas=True,
                         tol=1e-4, maxiter=96, **knobs)
            return r.cg_iters
        return str(jax.make_jaxpr(jax.vmap(one))(perm))

    base = trace()
    assert "top_k" in base  # straggler selection of the two-pass recook
    no_two_pass = trace(two_pass=False)
    assert "top_k" not in no_two_pass
    assert trace(refine=False) != base  # pass-3 refinement dropped
    no_packed = trace(packed=False)
    assert "top_k" not in no_packed  # blocked path has no recook
    assert no_packed != no_two_pass
    assert trace(twopass_j1=32) != base


def test_pressure_pallas_cheb_matches_xla(key):
    """The fused kernel with the Chebyshev smoother (interpret mode) and the
    XLA path with the same smoother deliver the same solution to solver
    tolerance (CLAUDE.md invariant: both paths numerically equivalent)."""
    from historymatching_tpu.ops.cg import pcg
    from historymatching_tpu.ops.multigrid import (
        build_hierarchy,
        coarse_inverse,
        vcycle_solver,
    )
    from historymatching_tpu.ops.pressure_pallas import pressure_solve_pallas
    from historymatching_tpu.ops.stencil import (
        stencil_diag_nopin,
        stencil_matvec,
        transmissibilities,
    )

    m = default_model(Nx=16, Ny=16)
    g = m.grid
    perm = jax.random.normal(key, (g.Nxy,)).astype(jnp.float32)
    K = (0.1 + jnp.exp(3 * perm)).reshape(g.shape)
    TX, TY = transmissibilities(K, K, g.hx, g.hy)
    dnp = stencil_diag_nopin(TX, TY)
    pin = jnp.mean(dnp)
    diag = dnp.at[0, 0].add(pin)
    q = jnp.zeros(g.shape, jnp.float32).at[8, 8].set(1.0).at[2, 2].set(-1.0)
    hierarchy = build_hierarchy(TX, TY, pin)
    Nc, Mc = hierarchy[-1][2].shape
    Ainv3 = coarse_inverse(hierarchy).reshape(-1, Nc, Mc)
    hier_flat = tuple(x for lvl in hierarchy for x in lvl)

    p_pl, _, _ = pressure_solve_pallas(
        hier_flat, Ainv3, q, jnp.zeros_like(q), jnp.ones_like(q), tol=1e-4,
        maxiter=256, interpret=True, smoother="cheb",
    )
    mv = lambda x: stencil_matvec(TX, TY, diag, x)  # noqa: E731
    p_x, _, _ = pcg(
        mv, q, x0=jnp.zeros_like(q), Minv=vcycle_solver(hierarchy, smoother="cheb"),
        tol=1e-4, maxiter=256, restart_every=8,
    )
    nq = np.linalg.norm(np.asarray(q))
    for p_sol in (p_pl, p_x):
        r = np.asarray(q - mv(p_sol))
        assert np.linalg.norm(r) / nq < 1e-3
    scale = np.abs(np.asarray(p_x)).max()
    assert np.allclose(np.asarray(p_pl), np.asarray(p_x), atol=2e-3 * scale)
