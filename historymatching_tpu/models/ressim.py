"""2D two-phase incompressible reservoir simulator (TPFA), TPU-native.

Re-implements from scratch the physics of the reference's external simulator
`TPFA_ResSim` (API surface reconstructed in SURVEY.md §2.2; physics per the
cited Aarnes/Gimse/Lie Matlab-origin description, reference
notebooks/HistoryMatch.py:93-95): per time step,

1. pressure: TPFA 5-point system with harmonic inter-cell transmissibilities
   from K * total mobility lambda_t(s) — solved here by matrix-free Jacobi-CG
   (warm-started), not sparse direct;
2. Darcy face fluxes from pressure differences;
3. explicit upwind saturation transport with CFL-limited sub-stepping
   (dynamic trip count via `lax.fori_loop`; static shapes throughout);
quadratic (Corey) relative permeabilities, fractional flow fw = Mw/(Mw+Mo).

Design: the model is an immutable pytree dataclass (`.replace(...)` instead
of the reference's deepcopy+setattr "remake", Optimise.py:131-144); the whole
`simulate` is one `lax.scan` over time, jit/vmap/shard_map-able; no
exceptions under jit — validity (rate balance, wells in domain, CG
convergence) is returned as a flag (exception-as-penalty equivalent,
Optimise.py:120-125).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from historymatching_tpu.grid import Grid2D
from historymatching_tpu.ops.cg import pcg
from historymatching_tpu.ops.multigrid import (
    build_hierarchy,
    build_hierarchy_5pt,
    n_levels,
    vcycle_solver,
)
from historymatching_tpu.ops.stencil import (
    face_fluxes,
    stencil_diag_nopin,
    stencil_matvec,
    stencil_residual_ds,
    transmissibilities,
)


@dataclasses.dataclass(frozen=True)
class Fluid:
    """Two-phase fluid: viscosities and irreducible saturations."""

    vw: float = 1.0  # water viscosity
    vo: float = 1.0  # oil viscosity
    swc: float = 0.0  # connate water saturation
    sor: float = 0.0  # residual oil saturation


def _f(x):
    """Canonicalize to a float array, preserving an existing float dtype
    (so float32 ensembles stay float32 even when x64 is enabled)."""
    x = jnp.asarray(x)
    if not jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(jnp.result_type(float))
    return x


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ResSim:
    """Immutable reservoir model configuration (pytree).

    Array leaves: K (2, Nx, Ny) direction permeabilities; well coordinates
    (nWell, 2); well rates (nWell, nT) with nT == 1 meaning constant-in-time
    (reference S1.4/S1.5). Static metadata: grid, fluid, name.
    """

    K: jax.Array
    inj_xy: jax.Array
    prd_xy: jax.Array
    inj_rates: jax.Array
    prd_rates: jax.Array
    grid: Grid2D = dataclasses.field(metadata=dict(static=True))
    fluid: Fluid = dataclasses.field(metadata=dict(static=True))
    name: str = dataclasses.field(default="", metadata=dict(static=True))

    # -- construction --------------------------------------------------------
    @classmethod
    def build(
        cls,
        Nx=32,
        Ny=32,
        Lx=1.0,
        Ly=1.0,
        K=None,
        inj_xy=None,
        prd_xy=None,
        inj_rates=None,
        prd_rates=None,
        fluid=None,
        name="",
    ):
        """Convenience constructor mirroring `ResSim(Nx=20, Ny=20, Lx=2, Ly=1)`
        (reference HistoryMatch.py:97). Wells default to a centre injector and
        a far-corner producer with balanced unit rates."""
        grid = Grid2D(Nx=Nx, Ny=Ny, Lx=Lx, Ly=Ly)
        if K is None:
            K = np.ones((2, Nx, Ny))
        if inj_xy is None:
            inj_xy = [[Lx / 2, Ly / 2]]
        if prd_xy is None:
            prd_xy = [[Lx - grid.hx / 2, Ly - grid.hy / 2]]
        if inj_rates is None:
            inj_rates = np.ones((len(np.atleast_2d(inj_xy)), 1))
        if prd_rates is None:
            n = len(np.atleast_2d(prd_xy))
            prd_rates = np.ones((n, 1)) / n
        return cls(
            K=_f(K),
            inj_xy=jnp.atleast_2d(_f(inj_xy)),
            prd_xy=jnp.atleast_2d(_f(prd_xy)),
            inj_rates=jnp.atleast_2d(_f(inj_rates)),
            prd_rates=jnp.atleast_2d(_f(prd_rates)),
            grid=grid,
            fluid=fluid or Fluid(),
            name=name,
        )

    def replace(self, **kw):
        """Functional reconfiguration — the `remake` equivalent
        (reference Optimise.py:131-144). Arrays are canonicalized."""
        for k in ("K", "inj_xy", "prd_xy", "inj_rates", "prd_rates"):
            if k in kw:
                v = _f(kw[k])
                if k != "K":
                    v = jnp.atleast_2d(v)
                kw[k] = v
        return dataclasses.replace(self, **kw)

    # -- geometry delegation (reference S1.2/S1.3 surface) -------------------
    @property
    def Nx(self):
        return self.grid.Nx

    @property
    def Ny(self):
        return self.grid.Ny

    @property
    def Lx(self):
        return self.grid.Lx

    @property
    def Ly(self):
        return self.grid.Ly

    @property
    def Nxy(self):
        return self.grid.Nxy

    @property
    def shape(self):
        return self.grid.shape

    @property
    def mesh(self):
        return self.grid.mesh

    @property
    def domain(self):
        return self.grid.domain

    @property
    def nInj(self):
        return self.inj_xy.shape[0]

    @property
    def nPrd(self):
        return self.prd_xy.shape[0]

    def sub2ind(self, ix, iy):
        return self.grid.sub2ind(ix, iy)

    def ind2xy(self, ind):
        return self.grid.ind2xy(ind)

    def xy2ind(self, x, y):
        return self.grid.xy2ind(x, y)

    def sub2xy(self, ix, iy):
        return self.grid.sub2xy(ix, iy)

    # -- simulation -----------------------------------------------------------
    def sim(self, dt, nTime, wsat0, pbar=None, **kw):
        """Reference-style entry (S1.7): returns saturations (nTime+1, Nxy),
        including the initial state. `pbar` accepted for API parity (no-op —
        the whole loop is one compiled scan)."""
        del pbar
        return simulate(self, wsat0, dt, nTime, **kw).wsats

    def validate(self):
        """Host-side eager validation — raises like the reference simulator
        (HistoryMatch.py:182-184) on unbalanced rates or out-of-domain wells."""
        inj = np.atleast_2d(np.asarray(self.inj_rates))
        prd = np.atleast_2d(np.asarray(self.prd_rates))
        ti, tp = inj.sum(0), prd.sum(0)
        if not np.allclose(ti, tp.repeat(len(ti)) if tp.size == 1 else tp):
            raise ValueError(f"Unbalanced rates: inj {ti} != prd {tp}")
        for xy, lbl in ((self.inj_xy, "inj"), (self.prd_xy, "prd")):
            xy = np.asarray(xy)
            ok = (xy[:, 0] >= 0) & (xy[:, 0] <= self.Lx) & (xy[:, 1] >= 0) & (xy[:, 1] <= self.Ly)
            if not ok.all():
                raise ValueError(f"{lbl}_xy outside domain: {xy[~ok]}")
        return self


class SimResult(NamedTuple):
    """Outputs of `simulate` (pytree)."""

    wsats: jax.Array  # (nTime+1, Nxy) saturation history incl. initial state
    actual_inj_rates: jax.Array  # (nInj, nTime) rates actually applied
    actual_prd_rates: jax.Array  # (nPrd, nTime)
    valid: jax.Array  # bool: configuration valid (rates balanced, wells in domain)
    # — the exception-as-penalty analogue (reference raises on these).
    cg_ok: jax.Array  # bool: every pressure solve met its acceptance residual
    # — solver-quality flag; the NPV objective gates on it (opt/npv.py):
    # unconverged fluxes are garbage and can spuriously inflate the value.
    cg_iters: jax.Array  # (nTime,) pressure-solve iteration counts
    substeps: jax.Array  # (nTime,) transport CFL substep counts
    # (nTime, Nxy) pressure trajectory when simulate(keep_pressures=True):
    # feed it back as `p_init` on a RE-simulation of a nearby model (e.g.
    # the next ES-MDA pass's ensemble) to warm-start every solve from the
    # same-time-step pressure of the previous pass. () otherwise.
    pressures: jax.Array | tuple = ()
    # (nTime, nPrd) producer-cell saturations, emitted per step inside the
    # scan — the observation series without materializing the (nTime, Nxy)
    # trajectory. With simulate(keep_wsats=False), `wsats` carries only
    # [initial, final] (2, Nxy) and this is the only time-resolved output:
    # at ensemble scale the full history is pure HBM traffic (~2.6 GB of
    # stacked writes per ES-MDA workload) consumed only at 4 cells/step.
    prd_sats: jax.Array | tuple = ()


# -- physics helpers -----------------------------------------------------------


def relperm(s, fluid: Fluid):
    """Quadratic (Corey) mobilities. Returns (Mw, Mo)."""
    S = (s - fluid.swc) / (1.0 - fluid.swc - fluid.sor)
    Mw = S**2 / fluid.vw
    Mo = (1.0 - S) ** 2 / fluid.vo
    return Mw, Mo


def frac_flow(s, fluid: Fluid):
    Mw, Mo = relperm(s, fluid)
    return Mw / (Mw + Mo)


def _rates_seq(rates, nTime):
    """(nWell, nT) -> (nTime, nWell); nT==1 broadcasts (constant-in-time)."""
    rates = jnp.atleast_2d(rates)
    nT = rates.shape[1]
    if nT == 1:
        return jnp.broadcast_to(rates[:, 0], (nTime, rates.shape[0]))
    if nT != nTime:
        raise ValueError(f"rates have {nT} steps; expected 1 or {nTime}")
    return rates.T


def _source_field(model: ResSim, inj_t, prd_t):
    """Assemble the (Nx, Ny) volumetric source field for one time step.
    Wells collocate to cell centres (scatter-add; traceable well coords)."""
    g = model.grid
    q = jnp.zeros((g.Nxy,), dtype=inj_t.dtype)
    inj_ind = g.xy2ind(model.inj_xy[:, 0], model.inj_xy[:, 1])
    prd_ind = g.xy2ind(model.prd_xy[:, 0], model.prd_xy[:, 1])
    q = q.at[inj_ind].add(inj_t)
    q = q.at[prd_ind].add(-prd_t)
    return q.reshape(g.shape)


def _scaled_solver_hierarchy(model: ResSim, s):
    """The Jacobi-scaled TPFA multigrid hierarchy for saturation field `s`
    — the same construction `pressure_step(scale_system=True)` performs for
    the current step. Used by `simulate(freeze_coarse=True)` to precompute
    the coarse inverse once per pass."""
    g = model.grid
    Mw, Mo = relperm(s, model.fluid)
    mob = Mw + Mo
    TX, TY = transmissibilities(model.K[0] * mob, model.K[1] * mob, g.hx, g.hy)
    diag_np = stencil_diag_nopin(TX, TY)
    diag = diag_np.at[0, 0].add(jnp.mean(diag_np))
    sd = lax.rsqrt(diag)
    TXs = TX * sd[:-1, :] * sd[1:, :]
    TYs = TY * sd[:, :-1] * sd[:, 1:]
    return build_hierarchy_5pt(TXs, TYs, jnp.ones_like(diag))


def pressure_step(model: ResSim, s, q, p0, tol, maxiter, tol_accept=None, precond="mg",
                  use_pallas=False, patience_iters=96, scale_system=True,
                  packed=True, two_pass=True, twopass_j1=64, twopass_div=4,
                  refine=True, coarse_Ainv=None, smoother="jacobi"):
    """TPFA pressure solve for saturation field `s` (Nx, Ny) and source `q`.
    Returns (p, Fx, Fy, iters, accepted). `accepted` compares the achieved
    true relative residual against `tol_accept` (defaults to `tol`) — float32
    solves on high-contrast fields have an accuracy floor above the target.

    `precond`: "mg" (multigrid V-cycle; near grid-independent CG counts and a
    much lower float32 floor) or "jacobi". Falls back to Jacobi when the grid
    has no coarsenable hierarchy.

    `scale_system` (default): solve the symmetrically Jacobi-scaled system
    D^-1/2 A D^-1/2 y = D^-1/2 q, p = D^-1/2 y. The scaled operator has unit
    diagonal, so the f32 residual computation no longer sums across the
    permeability contrast's dynamic range — measured to rescue members whose
    unscaled V-cycle-PCG stalls at relative residual ~1 (!) and to bound the
    worst-case floor (max 3.5e-2 vs 1.0 over a prior sample at 64x64), while
    costing nothing (a few elementwise ops). It also makes the Pallas and XLA
    paths numerically identical by construction — the unscaled XLA path's
    compensated (double-single) residual is unnecessary here, and was 7-40x
    too slow inside Mosaic kernels, which made the two paths drift apart
    (round-1 posterior-shift incident)."""
    g = model.grid
    Mw, Mo = relperm(s, model.fluid)
    mob = Mw + Mo
    Kx = model.K[0] * mob
    Ky = model.K[1] * mob
    TX, TY = transmissibilities(Kx, Ky, g.hx, g.hy)
    diag_np = stencil_diag_nopin(TX, TY)
    pin = jnp.mean(diag_np)
    diag = diag_np.at[0, 0].add(pin)

    if scale_system:
        sd = lax.rsqrt(diag)
        TXo, TYo = TX, TY  # original operator: fluxes use these
        TX = TX * sd[:-1, :] * sd[1:, :]
        TY = TY * sd[:, :-1] * sd[:, 1:]
        diag_solve = jnp.ones_like(diag)
        q_solve = q * sd
        p0_solve = p0 * (diag * sd)  # = p0 * sqrt(diag)
        unscale = lambda y: y * sd  # noqa: E731
        # Stop on the PHYSICAL (unscaled) residual norm: w * r_scaled is the
        # original system's flux imbalance (r_orig = D^1/2 r_scaled), the
        # quantity the transport step actually feels.
        mweight = diag * sd  # = sqrt(diag)
    else:
        TXo, TYo = TX, TY
        diag_solve, q_solve, p0_solve = diag, q, p0
        unscale = lambda y: y  # noqa: E731
        mweight = None

    matvec = lambda p: stencil_matvec(TX, TY, diag_solve, p)  # noqa: E731
    if precond == "mg" and n_levels(g.Nx, g.Ny) >= 2:
        if scale_system:
            hierarchy = build_hierarchy_5pt(TX, TY, diag_solve)
        else:
            hierarchy = build_hierarchy(TX, TY, pin)
        if use_pallas:
            from historymatching_tpu.ops.multigrid import coarse_inverse
            from historymatching_tpu.ops.pressure_pallas import pressure_solve_vmappable

            Nc, Mc = hierarchy[-1][2].shape
            if coarse_Ainv is not None:
                # Frozen (per-pass) coarse inverse — preconditioner-only
                # staleness; see simulate(freeze_coarse=...).
                Ainv3 = coarse_Ainv
            else:
                Ainv3 = coarse_inverse(hierarchy).reshape(-1, Nc, Mc)  # row-unflattened
            hier_flat = tuple(x for lvl in hierarchy for x in lvl)
            # custom_vmap: per-member fused kernel when unbatched; under the
            # ensemble vmap the rule dispatches the block-batched kernel
            # (~1.4x faster — ops sized (block, Nx, Ny) amortize dispatch).
            w = jnp.ones_like(diag) if mweight is None else mweight
            y, iters, rel_res = pressure_solve_vmappable(
                hier_flat, Ainv3, q_solve, p0_solve, w, tol=tol, maxiter=maxiter,
                patience_iters=patience_iters, packed=packed, two_pass=two_pass,
                twopass_j1=twopass_j1, twopass_div=twopass_div, refine=refine,
                smoother=smoother,
            )
            p = unscale(y)
            Fx, Fy = face_fluxes(TXo, TYo, p)
            accepted = rel_res <= (tol if tol_accept is None else tol_accept)
            return p, Fx, Fy, iters, accepted
        Minv = vcycle_solver(hierarchy, Ainv=coarse_Ainv, smoother=smoother)
        restart_every = 8
    else:
        Minv = 1.0 / diag_solve
        restart_every = 64
    # Unscaled fallback only: compensated (double-single) replacement residual
    # (measured ~1.5x lower f32 floor there). The scaled system doesn't need
    # it — its residual sums have no contrast-driven cancellation.
    residual_fn = (
        None if scale_system
        else (lambda x: stencil_residual_ds(TX, TY, diag_solve, x, q_solve))
    )
    y, iters, rel_res = pcg(
        matvec, q_solve, x0=p0_solve, Minv=Minv, tol=tol, maxiter=maxiter,
        restart_every=restart_every, patience_iters=patience_iters,
        residual_fn=residual_fn, metric_weight=mweight,
    )
    p = unscale(y)
    Fx, Fy = face_fluxes(TXo, TYo, p)
    accepted = rel_res <= (tol if tol_accept is None else tol_accept)
    return p, Fx, Fy, iters, accepted


def transport_step(model: ResSim, s, Fx, Fy, q, dt, max_substeps=4096, use_pallas=False,
                   packed=True):
    """Explicit upwind transport over one outer step `dt`, with CFL-limited
    sub-stepping (matlab-origin rule: pm = min(pv/influx),
    cfl = (1-swc-sor)/3 * pm, Nts = ceil(dt/cfl)).

    Dynamic substep count via `fori_loop` with a traced bound — shapes stay
    static; under vmap the batch runs to the max count with masked lanes.
    With `use_pallas`, all substeps run in one fused VMEM kernel
    (ops/transport_pallas.py) instead of per-substep XLA passes.
    """
    g = model.grid
    fl = model.fluid
    pv = g.h2  # pore volume per cell (porosity = 1)

    fi = jnp.maximum(q, 0.0)  # injection (water in, fw = 1)
    fp = jnp.minimum(q, 0.0)  # production (carries local fw)

    XP, XN = jnp.maximum(Fx, 0.0), jnp.minimum(Fx, 0.0)
    YP, YN = jnp.maximum(Fy, 0.0), jnp.minimum(Fy, 0.0)
    # Total influx into each cell (+ well injection)
    Vi = XP[:-1, :] + YP[:, :-1] - XN[1:, :] - YN[:, 1:]
    inflow = Vi + fi
    pm = jnp.min(jnp.where(inflow > 0, pv / jnp.where(inflow > 0, inflow, 1.0), jnp.inf))
    cfl = (1.0 - fl.swc - fl.sor) / 3.0 * pm
    n_sub = jnp.clip(jnp.ceil(dt / cfl), 1, max_substeps).astype(jnp.int32)
    dts = dt / n_sub.astype(s.dtype)

    if use_pallas:
        from historymatching_tpu.ops.transport_pallas import transport_substeps_vmappable

        fluid_t = (fl.vw, fl.vo, fl.swc, fl.sor)
        # custom_vmap: per-member fused kernel when unbatched; under the
        # ensemble vmap the rule dispatches the block-batched kernel (the
        # block runs to its max CFL count with per-member freeze masks).
        s = transport_substeps_vmappable(s, Fx, Fy, q, dts / pv, n_sub,
                                         fluid_t=fluid_t, packed=packed)
        return s, n_sub

    def substep(_, s):
        fw = frac_flow(s, fl)
        # Upwind water flux across faces: donor-cell fw.
        fw_l = jnp.pad(fw, ((1, 0), (0, 0)))  # fw of left cell at x-face i
        fw_r = jnp.pad(fw, ((0, 1), (0, 0)))
        Fw_x = XP * fw_l + XN * fw_r
        fw_d = jnp.pad(fw, ((0, 0), (1, 0)))
        fw_u = jnp.pad(fw, ((0, 0), (0, 1)))
        Fw_y = YP * fw_d + YN * fw_u
        div = (Fw_x[1:, :] - Fw_x[:-1, :]) + (Fw_y[:, 1:] - Fw_y[:, :-1])
        s_new = s + (dts / pv) * (fi + fp * fw - div)
        # Physical clamp: the monotone upwind scheme keeps s in [swc, 1-sor]
        # in exact arithmetic; float roundoff (and any pressure-solve floor)
        # can push it out, where the CFL bound's |f'| <= 3 premise fails.
        return jnp.clip(s_new, fl.swc, 1.0 - fl.sor)

    s = lax.fori_loop(0, n_sub, substep, s)
    return s, n_sub


@partial(
    jax.jit,
    static_argnames=(
        "dt", "nTime", "tol", "tol_accept", "maxiter", "max_substeps", "precond", "use_pallas",
        "patience_iters", "scale_system", "packed", "two_pass", "twopass_j1",
        "twopass_div", "refine", "keep_pressures", "freeze_coarse", "coarse_warm",
        "keep_wsats", "smoother",
    ),
)
def simulate(model: ResSim, wsat0, dt, nTime, *, tol=None, tol_accept=None, maxiter=None,
             max_substeps=4096, precond="mg", use_pallas=None, patience_iters=96,
             scale_system=True, packed=True, two_pass=True, twopass_j1=64,
             twopass_div=4, refine=True, p_init=None, keep_pressures=False,
             freeze_coarse=False, coarse_warm=False, keep_wsats=True,
             smoother="jacobi"):
    """Run `nTime` steps of size `dt` from saturation `wsat0` (Nxy,).

    Restartable from any state (reference HistoryMatch.py:366-374): pass the
    last row of a previous run's `wsats` as `wsat0`. Fully jit/vmap-able.
    jitted at the API boundary (the TPU backend here cannot eager-dispatch
    loop primitives, and per-op dispatch would be slow anyway).

    `packed` / `two_pass` / `twopass_j1` / `twopass_div` / `refine` are the
    Pallas batched-path strategy knobs (lane packing, straggler recook,
    iterative refinement — see `ops.pressure_pallas.pressure_solve_vmappable`).
    They are explicit static kwargs so the compiled program always matches
    the configuration it reports: env-var reads at trace time (the round-2
    scheme) are silently ignored by the jit cache on same-shape re-calls.
    They only affect the TPU (`use_pallas`) path.

    `keep_wsats` (static, default True): with False, `wsats` carries only
    [initial, final] (2, Nxy) — restartable, but the (nTime, Nxy) history is
    never stacked by the scan. The time-resolved producer-cell observation
    series is always available as `SimResult.prd_sats` (nTime, nPrd),
    emitted per step at 4-float cost. At ensemble scale the history stack
    is the forward pass's dominant HBM write traffic.

    `smoother` (static, "jacobi"|"cheb"): the V-cycle smoother — damped
    Jacobi (omega=0.7) or degree-nu Chebyshev on the diagonally
    preconditioned operator (ops/multigrid._cheb; same cost per sweep,
    optimal polynomial damping). Preconditioner-only: any iterate meeting
    `tol` is equally valid; flips of the default must re-pin parity.

    `coarse_warm`: thread the coarsest-level Newton-Schulz inverse through
    the time scan as the next step's initial guess — every step's
    preconditioner is refreshed from the current mobility (no staleness,
    unlike `freeze_coarse`), but converges in 1-3 GEMM pairs instead of the
    cold ramp. Preconditioner-only: iterates change at rounding level, the
    acceptance criterion does not.

    `p_init` (optional, (nTime, Nxy)): per-time-step pressure warm starts —
    e.g. the `pressures` output of a previous simulation of a NEARBY model
    (the ES-MDA cross-pass case: pass k+1 re-simulates slightly-updated
    fields, so pass k's same-step pressure is a far better start than the
    previous step's). Warm starts change only the iterate path, never the
    acceptance criterion: any solution meeting `tol` is equally valid.
    With `keep_pressures`, the result carries the pressure trajectory to
    feed the next pass.
    """
    g = model.grid
    dtype = jnp.result_type(jnp.asarray(wsat0).dtype, float)
    if tol is None:
        # float32 default 2e-3: flux errors well below the obs noise and the
        # f32 contrast floor, ~3x fewer MG-CG iterations than grinding at an
        # often-unreachable 1e-5 (measured on TPU: 3.9s -> 0.57s per step at
        # N=1000, 64x64, with posterior quality unchanged).
        tol = 1e-10 if dtype == jnp.float64 else 2e-3
    if tol_accept is None:
        # float32 has an accuracy floor set by the permeability contrast.
        # Measured over full 40-step runs (EnOpt 20x20 case, K contrast
        # ~3e5): healthy solves stagnate at relative residual up to ~3.3e-2
        # (3.5e-2 worst-case over a 64x64 prior sample), while genuinely
        # garbage solves (injector confined at the domain corner: the f32
        # pressure field cannot even represent the near-well differences,
        # NPV off ~2x vs exact f64) stall at >= 1.3e-1. 'valid' means 'not
        # garbage': 5e-2 sits between the two measured populations — a
        # 2e-2 gate misclassifies most floor-level solves as failures.
        tol_accept = 1e-6 if dtype == jnp.float64 else 5e-2
    if maxiter is None:
        maxiter = g.Nxy if dtype == jnp.float64 else 4 * max(g.Nx, g.Ny)
    if use_pallas is None:
        # Fused transport kernel: TPU only (Mosaic); XLA path elsewhere.
        use_pallas = jax.default_backend() == "tpu"

    s0 = jnp.asarray(wsat0, dtype=dtype).reshape(g.shape)
    # shard_map vma hygiene: the scan carry picks up "varying" from the
    # (member-sharded) K; a replicated initial state must match. Adding a
    # K-derived zero is a no-op numerically and unifies the types.
    s0 = s0 + jnp.sum(model.K * 0).astype(dtype)
    inj_seq = _rates_seq(model.inj_rates, nTime).astype(dtype)  # (nTime, nInj)
    prd_seq = _rates_seq(model.prd_rates, nTime).astype(dtype)

    # Validity: balanced at every step + wells in domain (jit-safe flags).
    tot_i, tot_p = inj_seq.sum(1), prd_seq.sum(1)
    scale = jnp.maximum(jnp.abs(tot_i) + jnp.abs(tot_p), 1e-30)
    balanced = jnp.all(jnp.abs(tot_i - tot_p) <= 1e-6 * scale)
    wells_ok = jnp.all(g.in_domain(model.inj_xy[:, 0], model.inj_xy[:, 1])) & jnp.all(
        g.in_domain(model.prd_xy[:, 0], model.prd_xy[:, 1])
    )

    # Frozen per-pass coarse inverse (`freeze_coarse`): the coarsest-level
    # Newton-Schulz inverse is the priciest piece of the per-step
    # preconditioner setup (device trace: 0.18 s of a 2.5 s N=1000 forward
    # pass), yet it only enters as the V-cycle's coarse SOLVE — the fine
    # operator stays exact, so computing it once from the initial
    # saturation's mobility trades a slightly-stale coarse correction for
    # 40x fewer Newton-Schulz runs. Preconditioner-only: any iterate
    # meeting `tol` is equally valid.
    freeze_k = 0
    if (freeze_coarse and precond == "mg" and scale_system
            and n_levels(g.Nx, g.Ny) >= 2):
        # True -> once per pass; int k -> refresh every k steps (a once-per-
        # pass inverse from the s0=all-oil mobility measurably raised the
        # stragglers' f32 accuracy floor: parity ratio at seed 3 went
        # 1.021 -> 1.078 regardless of recook budget; tracking the front
        # every ~8 steps keeps the basis fresh).
        freeze_k = nTime if freeze_coarse is True else int(freeze_coarse)
        if freeze_k <= 0 or nTime % freeze_k:
            raise ValueError(
                f"freeze_coarse={freeze_coarse!r} must divide nTime={nTime}")

    # Warm-started (never stale) coarse inverse: unlike freeze_coarse, every
    # step's inverse is refreshed from the CURRENT mobility — only the
    # Newton-Schulz path there is shortened, by threading the previous
    # step's inverse through the scan carry as the initial guess (the
    # operator drifts slowly step-to-step, so 1-3 refresh GEMM pairs replace
    # the cold ~log2(cond) ramp; ops/linalg.spd_inverse converges to the
    # same residual floor either way).
    warm_on = (coarse_warm and precond == "mg" and scale_system
               and n_levels(g.Nx, g.Ny) >= 2)
    if warm_on and freeze_k:
        raise ValueError("coarse_warm and freeze_coarse are mutually exclusive")

    def make_coarse_Ainv(s):
        from historymatching_tpu.ops.multigrid import coarse_inverse

        hier = _scaled_solver_hierarchy(model, s)
        Ainv = coarse_inverse(hier)
        if use_pallas:
            Nc, Mc = hier[-1][2].shape
            return Ainv.reshape(-1, Nc, Mc)
        return Ainv

    # Producer-cell observation indices (traced-coordinate safe: EnOpt may
    # differentiate/optimize well positions through xy2ind).
    prd_idx = g.xy2ind(model.prd_xy[:, 0], model.prd_xy[:, 1])

    def _ys(s_new, p, iters, conv, n_sub):
        """Per-step scan outputs. The big (Nxy,) stacks are emitted only
        when requested — at ensemble scale the full saturation/pressure
        trajectories are the dominant HBM write traffic of the forward
        pass, while the observation series is 4 floats/step."""
        ys = dict(sobs=s_new.reshape(-1)[prd_idx], iters=iters, conv=conv,
                  subs=n_sub)
        if keep_wsats:
            ys["sats"] = s_new.reshape(-1)
        if keep_pressures:
            ys["press"] = p.reshape(-1)
        return ys

    def step_with(coarse_Ainv):
        def step(carry, xs_t):
            s, p_prev = carry
            inj_t, prd_t, p_ws = xs_t
            q = _source_field(model, inj_t, prd_t).astype(dtype)
            # Warm start from the previous step's pressure, or — when
            # `p_init` is threaded in — from the previous PASS's same-step
            # pressure.
            # NOTE: linear extrapolation (2*p_t - p_{t-1}) was measured
            # HARMFUL: it looks great on one seed (39s/1.0029 at patience
            # 64) but flips another seed's posterior to non-improving at
            # EVERY patience level (seed 2: RMSE 1.19 -> 1.27-1.29 vs 0.72
            # with the plain warm start). Do not reintroduce without
            # multi-seed validation.
            p0_t = p_prev if p_ws is None else p_ws
            p, Fx, Fy, iters, conv = pressure_step(
                model, s, q, p0_t, tol, maxiter, tol_accept, precond,
                use_pallas, patience_iters, scale_system, packed, two_pass,
                twopass_j1, twopass_div, refine, coarse_Ainv, smoother,
            )
            s_new, n_sub = transport_step(model, s, Fx, Fy, q, dt,
                                          max_substeps, use_pallas, packed)
            return (s_new, p), _ys(s_new, p, iters, conv, n_sub)
        return step

    p0 = jnp.zeros(g.shape, dtype=dtype) + s0 * 0  # same vma as s0
    p_init_seq = (None if p_init is None
                  else jnp.asarray(p_init, dtype).reshape(nTime, *g.shape))
    xs = (inj_seq, prd_seq, p_init_seq)
    if freeze_k:
        # Chunked scan: the coarse inverse is recomputed at each chunk
        # boundary (outside the inner scan body) from the chunk's initial
        # saturation, then closed over as a constant for `freeze_k` steps.
        n_chunks = nTime // freeze_k
        xs_c = jax.tree_util.tree_map(
            lambda x: x.reshape(n_chunks, freeze_k, *x.shape[1:]), xs)

        def chunk(carry, xs_chunk):
            s, _ = carry
            return lax.scan(step_with(make_coarse_Ainv(s)), carry, xs_chunk)

        (s_fin, _), outs = lax.scan(chunk, (s0, p0), xs_c)
        outs = jax.tree_util.tree_map(
            lambda x: x.reshape(nTime, *x.shape[2:]), outs)
    elif warm_on:
        from historymatching_tpu.ops.multigrid import coarse_inverse

        def coarse_full(s, x0=None):
            hier = _scaled_solver_hierarchy(model, s)
            return coarse_inverse(hier, x0=x0), hier[-1][2].shape

        Ainv0, (Nc, Mc) = coarse_full(s0)

        def step_warm(carry, xs_t):
            s, p_prev, Ainv_prev = carry
            inj_t, prd_t, p_ws = xs_t
            q = _source_field(model, inj_t, prd_t).astype(dtype)
            p0_t = p_prev if p_ws is None else p_ws
            # Step-t inverse, warm-started from step t-1's (fresh operator;
            # the fine hierarchy built here is identical to pressure_step's
            # internal one, so XLA CSE folds the duplicate construction).
            Ainv, _ = coarse_full(s, x0=Ainv_prev)
            cAinv = Ainv.reshape(-1, Nc, Mc) if use_pallas else Ainv
            p, Fx, Fy, iters, conv = pressure_step(
                model, s, q, p0_t, tol, maxiter, tol_accept, precond,
                use_pallas, patience_iters, scale_system, packed, two_pass,
                twopass_j1, twopass_div, refine, cAinv, smoother,
            )
            s_new, n_sub = transport_step(model, s, Fx, Fy, q, dt,
                                          max_substeps, use_pallas, packed)
            return (s_new, p, Ainv), _ys(s_new, p, iters, conv, n_sub)

        (s_fin, _, _), outs = lax.scan(step_warm, (s0, p0, Ainv0), xs)
    else:
        (s_fin, _), outs = lax.scan(step_with(None), (s0, p0), xs)

    if keep_wsats:
        wsats = jnp.concatenate([s0.reshape(1, -1), outs["sats"]], axis=0)
    else:
        # Restartable final state only — the time-resolved observation
        # series lives in prd_sats; the scan never stacks the trajectory.
        wsats = jnp.stack([s0.reshape(-1), s_fin.reshape(-1)])
    return SimResult(
        wsats=wsats,
        actual_inj_rates=inj_seq.T,
        actual_prd_rates=prd_seq.T,
        valid=balanced & wells_ok,
        cg_ok=jnp.all(outs["conv"]),
        cg_iters=outs["iters"],
        substeps=outs["subs"],
        pressures=outs["press"] if keep_pressures else (),
        prd_sats=outs["sobs"],
    )
