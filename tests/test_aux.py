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
