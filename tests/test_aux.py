"""Auxiliary subsystems: checkpointing, profiling, parity utilities, plotting."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from historymatching_tpu import checkpoint, profiling
from historymatching_tpu.da.geostat import funm_psd
from historymatching_tpu.utils import emph, split


def test_checkpoint_roundtrip(tmp_path):
    state = {
        "perm": {"Prior": np.arange(12.0).reshape(3, 4), "ES": np.ones((2, 2))},
        "wsat_curnt": jnp.linspace(0, 1, 5),
        "step": np.asarray(7),
    }
    p = str(tmp_path / "ckpt.npz")
    checkpoint.save_checkpoint(p, state)
    assert os.path.exists(p)
    loaded = checkpoint.load_checkpoint(p)
    assert np.allclose(loaded["perm"]["Prior"], state["perm"]["Prior"])
    assert np.allclose(loaded["wsat_curnt"], np.asarray(state["wsat_curnt"]))
    assert int(loaded["step"]) == 7


def test_checkpoint_structure_roundtrip(tmp_path):
    """round-trip fidelity (round-3 VERDICT weak #6): load_checkpoint must
    return WHAT save_checkpoint got — container types, registered pytree
    node types (SimResult), scalars, None — not nested plain dicts."""
    from historymatching_tpu.models.ressim import SimResult

    res = SimResult(
        wsats=jnp.linspace(0, 1, 12).reshape(3, 4),
        actual_inj_rates=jnp.ones((1, 3)),
        actual_prd_rates=jnp.ones((2, 3)) / 2,
        valid=jnp.asarray(True),
        cg_ok=jnp.asarray(True),
        cg_iters=jnp.arange(3),
        substeps=jnp.arange(3) + 1,
    )
    state = {
        "result": res,
        "ensembles": [np.arange(6.0).reshape(2, 3), np.ones(4, np.float32)],
        "key": jax.random.PRNGKey(3),
        "meta": {"pass": 2, "alpha": 4.0, "label": "mda", "done": False,
                 "extra": None, "pair": (1, 2.5)},
    }
    p = str(tmp_path / "ckpt.npz")
    checkpoint.save_checkpoint(p, state)
    loaded = checkpoint.load_checkpoint(p)

    assert isinstance(loaded["result"], SimResult)
    assert np.array_equal(loaded["result"].wsats, np.asarray(res.wsats))
    assert loaded["result"].wsats.dtype == np.asarray(res.wsats).dtype
    assert isinstance(loaded["ensembles"], list) and len(loaded["ensembles"]) == 2
    assert loaded["ensembles"][1].dtype == np.float32
    assert np.array_equal(loaded["key"], np.asarray(state["key"]))
    m = loaded["meta"]
    assert m["pass"] == 2 and isinstance(m["pass"], int)
    assert m["alpha"] == 4.0 and isinstance(m["alpha"], float)
    assert m["label"] == "mda" and m["done"] is False and m["extra"] is None
    assert m["pair"] == (1, 2.5) and isinstance(m["pair"], tuple)


def _linear_mda_setup(key, N=24, M=40, p=8):
    """Cheap linear-forward ES-MDA problem (tests the driver machinery, not
    the simulator)."""
    k1, k2, k3 = jax.random.split(key, 3)
    H = jax.random.normal(k1, (M, p)) / np.sqrt(M)
    prior = jax.random.normal(k2, (N, M))
    obs = jax.random.normal(k3, (p,))
    R12 = 0.3 * jnp.eye(p)
    return prior, (lambda E: E @ H), obs, R12


def test_es_mda_resume_bitmatch(tmp_path, key):
    """Kill an ES-MDA run after pass 2 (checkpoint via callback), resume from
    the checkpoint, and bit-match the uninterrupted posterior (round-3
    VERDICT item 7)."""
    from historymatching_tpu.da.update import es_mda, mda_alphas

    prior, fwd, obs, R12 = _linear_mda_setup(key)
    k_mda = jax.random.PRNGKey(7)
    alphas = mda_alphas(4)

    post_ref = es_mda(prior, fwd, obs, R12, alphas, k_mda)

    ckpt = str(tmp_path / "mda.npz")

    class Killed(Exception):
        pass

    def cb(info):
        if info["pass_"] == 2:
            checkpoint.save_checkpoint(
                ckpt, {"E": info["E"], "key": info["key"], "pass": info["pass_"]})
            raise Killed

    try:
        es_mda(prior, fwd, obs, R12, alphas, k_mda, callback=cb)
        raise AssertionError("callback should have killed the run")
    except Killed:
        pass

    st = checkpoint.load_checkpoint(ckpt)
    post_res = es_mda(jnp.asarray(st["E"]), fwd, obs, R12, alphas,
                      jnp.asarray(st["key"]), start_pass=st["pass"])
    assert np.array_equal(np.asarray(post_res), np.asarray(post_ref))


def test_iterative_callbacks(key):
    """ies/iles progress hooks fire once per iteration with wall-clock."""
    from historymatching_tpu.da.update import decorrelator, ies
    from historymatching_tpu.utils import gaussian_noise

    prior, fwd, obs, R12 = _linear_mda_setup(key)
    N, p = prior.shape[0], R12.shape[0]
    perturbs = gaussian_noise(jax.random.PRNGKey(1), N, p, L=R12)
    seen = []
    ies(prior, fwd, obs, perturbs, decorrelator(R12), iMax=3,
        callback=seen.append)
    assert [i["iter"] for i in seen] == [1, 2, 3]
    assert all(i["iMax"] == 3 and i["elapsed_s"] > 0 for i in seen)
    assert seen[0]["E"].shape == prior.shape


def test_timed():
    f = jax.jit(lambda x: x * 2 + 1)
    best, first = profiling.timed(f, jnp.ones(128))
    assert best <= first
    assert best > 0


def test_funm_psd_sqrt():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(8, 8))
    C = jnp.asarray(A @ A.T + 8 * np.eye(8))
    S = funm_psd(C, jnp.sqrt)
    assert np.allclose(np.asarray(S @ S), np.asarray(C), atol=1e-8)


def test_emph_split():
    assert "x" in emph("x")
    assert split([1, 2, 3, 4, 5], 2) == [[1, 2], [3, 4], [5]]


def test_plotting_smoke(tmp_path):
    """Every plotting entry point renders without error (Agg backend)."""
    import matplotlib

    matplotlib.use("Agg", force=True)
    from historymatching_tpu import plotting
    from tests.test_sim import default_model

    m = default_model(Nx=8, Ny=8)
    rng = np.random.default_rng(0)
    fig, ax = plotting.freshfig("t1")
    plotting.plt_field(ax, m, rng.normal(size=m.Nxy), "pperm", wells=True, argmax=True, grid=True)
    # style levels render as filled contours (reference look); NaN fields and
    # kind="image" fall back to / force nearest-pixel imshow
    from matplotlib.contour import QuadContourSet
    from matplotlib.image import AxesImage

    fig, ax = plotting.freshfig("t1b")
    assert isinstance(plotting.plt_field(ax, m, rng.normal(size=m.Nxy), "corr"),
                      QuadContourSet)
    nanfield = rng.normal(size=m.Nxy)
    nanfield[:10] = np.nan
    assert isinstance(plotting.plt_field(ax, m, nanfield, "corr"), AxesImage)
    assert isinstance(
        plotting.plt_field(ax, m, rng.normal(size=m.Nxy), "pperm", kind="image"),
        AxesImage)
    plotting.fields(m, rng.normal(size=(5, m.Nxy)), "pperm", "ens")
    plotting.fields(m, {"a": rng.normal(size=m.Nxy)}, "perm", "named")
    prod = {"Truth": rng.uniform(size=(6, 4)), "Prior": rng.uniform(size=(3, 6, 4))}
    plotting.productions(prod, "past")
    fig, ax = plotting.freshfig("t2")
    plotting.plt_production(ax, rng.uniform(size=(6, 4)), obs=rng.uniform(size=(6, 4)))
    plotting.spectrum(np.logspace(0, -3, 10), "spec")
    plotting.iterative("iters", {"error": np.linspace(1, 0.5, 5), "obsrv": np.linspace(2, 1, 5)})
    fig, axs = plotting.figure12("opt")
    plotting.add_path12(*axs, rng.normal(size=(4, 2)), np.arange(4.0))
    a = plotting.anim(m, rng.uniform(size=(3, m.Nxy)), rng.uniform(size=(3, 4)))
    assert a is not None

    def comp(x=0, y=0):
        Z = np.zeros(m.Nxy)
        Z[int(m.xy2ind((x + 0.5) * 0.2, (y + 0.5) * 0.1))] = 1.0
        return Z

    comp.controls = dict(x=(0, 7), y=(0, 7))
    out = plotting.field_console(m, comp, "corr", "probe")
    # headless: returns the static frame
    assert out is None or len(out) == 3
    assert plotting.ens_style("ES")["color"] == "C2"
    assert plotting.dash_join("a", "", "b") == "a — b"
    import matplotlib.pyplot as plt

    plt.close("all")
