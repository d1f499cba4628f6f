"""Host-side plotting (thin matplotlib layer).

Covers the reference's plotting surface (SURVEY.md C9 + S3): style registry,
single-field plots with wells, ensemble field grids, production time series,
singular spectrum, iteration-RMS curves, and the optimisation-trajectory
panels. Everything takes NumPy-convertible arrays (device arrays are pulled
to host); nothing here runs on TPU.

The reference's ipywidgets dashboards (field_console/interact, C1n) are
notebook-only conveniences; here `interact` degrades gracefully to a no-op
decorator when ipywidgets is unavailable.
"""

from __future__ import annotations

import numpy as np

import matplotlib

matplotlib.use("Agg", force=False)  # headless-safe default; notebooks override
from matplotlib import pyplot as plt  # noqa: E402
from matplotlib.colors import AsinhNorm  # noqa: E402,F401  (re-export; reference
# notebooks use plotting.AsinhNorm for the rosenbrock contour scale)


# -- style registry (reference tools/plotting.py:20-54) -------------------------

styles = {
    "default": dict(title="", cmap="viridis", levels=17),
    "oil": dict(title="Oil saturation", cmap="viridis", levels=np.linspace(0, 1, 17),
                vmin=0, vmax=1, cticks=np.linspace(0, 1, 6)),
    "water": dict(title="Water saturation", cmap="Blues", levels=np.linspace(0, 1, 17),
                  vmin=0, vmax=1, cticks=np.linspace(0, 1, 6)),
    "perm": dict(title="Permeability", cmap="viridis", levels=17, locator="log"),
    "pperm": dict(title="Pre-perm", cmap="jet", levels=np.linspace(-4, 4, 21),
                  vmin=-4, vmax=4, cticks=np.arange(-4, 5)),
    "corr": dict(title="Correlation", cmap="bwr", levels=np.linspace(-1, 1, 21),
                 vmin=-1, vmax=1, under="green", over="orange", bad="black",
                 cticks=np.linspace(-1, 1, 9)),
    "NPV": dict(title="NPV", cmap="inferno", levels=17),
    "domain": dict(title="", cmap="Greys", levels=2, colorbar=False),
}


def freshfig(num=None, figsize=None, **kwargs):
    """Create/clear a named figure (reference tools/plotting.py:61-64)."""
    fig = plt.figure(num=num, figsize=figsize)
    fig.clear()
    ax_kw = {k: kwargs.pop(k) for k in list(kwargs) if k in ("ncols", "nrows", "sharex", "sharey")}
    if ax_kw:
        axs = fig.subplots(**ax_kw)
        return fig, axs
    return fig, fig.add_subplot(111)


def _style(style):
    if isinstance(style, str):
        return dict(styles.get(style, styles["default"]))
    return dict(style or styles["default"])


def plt_field(ax, model, Z, style="default", wells=True, argmax=False, colorbar=True,
              title=None, grid=False, kind="auto"):
    """Plot one field on the model grid with optional well markers
    (reference S3 `plt_field`).

    Rendering honours the full style contract of the reference's registry
    (tools/plotting.py:29-54,67-150): `levels` render as filled contours on
    the cell-centre mesh, `cticks` set the colorbar ticks, and
    `under`/`over`/`bad` colors mark out-of-range/masked cells. `kind`:
    "auto" (contours when the style has levels and the field is finite and
    non-constant — the reference's look), "image" (nearest-pixel imshow —
    shows the actual grid cells), or "contour" (force contours)."""
    st = _style(style)
    Z = np.asarray(Z).reshape(model.shape)
    extent = (0, model.Lx, 0, model.Ly)
    cmap = plt.get_cmap(st.get("cmap", "viridis")).copy()
    for which, setter in (("under", cmap.set_under), ("over", cmap.set_over),
                          ("bad", cmap.set_bad)):
        if st.get(which):
            setter(st[which])
    norm = None
    if st.get("locator") == "log":
        from matplotlib.colors import LogNorm

        norm = LogNorm(vmin=max(np.min(Z), 1e-12), vmax=np.max(Z))
        st.pop("vmin", None), st.pop("vmax", None)
    levels = st.get("levels")
    finite = bool(np.isfinite(Z).all())
    contours = kind == "contour" or (
        kind == "auto" and levels is not None and norm is None and finite
        and np.ptp(Z) > 0
    )
    if contours:
        # filled contours on cell centres (the reference's rendering); NaN
        # and log-scaled fields fall back to imshow (contourf leaves NaN
        # regions blank and ignores `bad`).
        x = (np.arange(model.Nx) + 0.5) * model.Lx / model.Nx
        y = (np.arange(model.Ny) + 0.5) * model.Ly / model.Ny
        extend = "both" if (st.get("under") or st.get("over")) else "neither"
        im = ax.contourf(x, y, Z.T, levels=levels, cmap=cmap,
                         vmin=st.get("vmin"), vmax=st.get("vmax"),
                         extend=extend)
        ax.set(xlim=(0, model.Lx), ylim=(0, model.Ly))
    else:
        im = ax.imshow(
            Z.T,
            origin="lower",
            extent=extent,
            cmap=cmap,
            vmin=st.get("vmin"),
            vmax=st.get("vmax"),
            norm=norm,
            interpolation="nearest",
            aspect="auto",
        )
    if wells:
        inj = np.atleast_2d(np.asarray(model.inj_xy))
        prd = np.atleast_2d(np.asarray(model.prd_xy))
        ax.plot(inj[:, 0], inj[:, 1], "v", color="w", mec="k", ms=9)
        ax.plot(prd[:, 0], prd[:, 1], "^", color="w", mec="k", ms=9)
    if argmax:
        i = int(np.argmax(Z.reshape(-1)))
        xy = np.asarray(model.ind2xy(i))
        ax.plot(*xy, "*", color="gold", mec="k", ms=14)
    if grid:
        ax.set_xticks(np.linspace(0, model.Lx, model.Nx + 1), minor=True)
        ax.set_yticks(np.linspace(0, model.Ly, model.Ny + 1), minor=True)
        ax.grid(True, which="minor", lw=0.3, color="w", alpha=0.4)
    ax.set(title=title if title is not None else st.get("title", ""))
    if colorbar and st.get("colorbar", True):
        ax.figure.colorbar(im, ax=ax, ticks=st.get("cticks"))
    return im


def fields(model, ensemble, style="pperm", title="", max_panels=12,
           colorbar=True):
    """Grid of ensemble member fields with a shared style and ONE shared
    colorbar (reference tools/plotting.py:67-150 uses AxesGrid with
    cbar_mode='single'; same layout via constrained_layout here). Panels
    share the style's color scale; when the style has no fixed vmin/vmax the
    common data range is used, so panels stay comparable."""
    if isinstance(ensemble, dict):
        labels = list(ensemble)
        data = [np.asarray(v) for v in ensemble.values()]
    else:
        data = list(np.atleast_2d(np.asarray(ensemble))[:max_panels])
        labels = [str(i) for i in range(len(data))]
    n = len(data)
    ncols = min(4, n)
    nrows = -(-n // ncols)
    fig, axs = plt.subplots(nrows, ncols, num=f"Fields: {title}", squeeze=False,
                            figsize=(3 * ncols, 2.2 * nrows),
                            layout="constrained")
    for ax in axs.ravel()[n:]:
        ax.axis("off")
    st = _style(style)
    if st.get("vmin") is None and st.get("locator") != "log":
        finite = [d[np.isfinite(d)] for d in data]
        finite = [d for d in finite if d.size]
        if finite:
            st["vmin"] = float(min(d.min() for d in finite))
            st["vmax"] = float(max(d.max() for d in finite))
    if np.ndim(st.get("levels")) == 0 and st.get("vmin") is not None:
        # contour panels must share explicit level positions, or each panel
        # would place its int-count levels on its own data range
        st["levels"] = np.linspace(st["vmin"], st["vmax"],
                                   int(st.get("levels") or 17))
    im = None
    for lbl, Z, ax in zip(labels, data, axs.ravel()):
        im = plt_field(ax, model, Z, st, wells=False, colorbar=False, title=lbl)
    if colorbar and im is not None and st.get("colorbar", True):
        fig.colorbar(im, ax=axs.ravel().tolist(), shrink=0.9,
                     ticks=st.get("cticks"))
    fig.suptitle(title)
    return fig, axs


def productions(prod_dict, title="", obs_key="Noisy", nrows=None):
    """Per-well production time-series: ensembles as transparent bundles,
    reference series highlighted; plots 1 - saturation (oil), like the
    reference (tools/plotting.py:505-544)."""
    some = next(v for k, v in prod_dict.items() if np.asarray(v).ndim >= 2)
    nPrd = np.asarray(some).shape[-1]
    ncols = min(4, nPrd)
    nrows = nrows or -(-nPrd // ncols)
    fig, axs = plt.subplots(nrows, ncols, num=f"Production: {title}", squeeze=False,
                            sharex=True, sharey=True, figsize=(3 * ncols, 2.5 * nrows))
    colors = {k: f"C{i}" for i, k in enumerate(prod_dict)}
    for w, ax in enumerate(axs.ravel()[:nPrd]):
        for k, v in prod_dict.items():
            v = np.asarray(v)
            if v.ndim == 2:  # single series (nTime, nPrd)
                ax.plot(1 - v[:, w], color=colors[k], lw=2, label=k)
            else:  # ensemble (N, nTime, nPrd)
                ax.plot(1 - v[:, :, w].T, color=colors[k], lw=0.5, alpha=0.3)
                ax.plot([], [], color=colors[k], label=k)
        ax.set_title(f"Well {w}")
        ax.set_ylim(-0.05, 1.05)
    axs.ravel()[0].legend(fontsize="x-small")
    fig.suptitle(title)
    fig.tight_layout()
    return fig, axs


def spectrum(svals, title=""):
    """Singular value spectrum (reference tools/plotting.py:547-558)."""
    fig, ax = freshfig(f"Spectrum: {title}", figsize=(5, 3))
    ax.semilogy(np.asarray(svals), ".-")
    ax.set(xlabel="index", ylabel="singular value", title=title)
    fig.tight_layout()
    return fig, ax


def iterative(title, series_dict):
    """RMS-vs-iteration curves, twin-axis for the obs mismatch
    (reference tools/plotting.py:574-590)."""
    fig, ax = freshfig(title, figsize=(6, 3.5))
    ax2 = ax.twinx()
    for i, (k, v) in enumerate(series_dict.items()):
        target = ax2 if k == "obsrv" else ax
        target.plot(np.asarray(v), f"C{i}.-", label=k)
    ax.set(xlabel="iteration", ylabel="RMS (state)")
    ax2.set_ylabel("RMS (obs)")
    lines = ax.get_lines() + ax2.get_lines()
    ax.legend(lines, [ln.get_label() for ln in lines])
    fig.tight_layout()
    return fig, (ax, ax2)


def figure12(title="", figsize=(9, 4)):
    """Two-panel optimisation figure: 2D path + objective curve
    (reference tools/plotting.py:593-617)."""
    fig, axs = plt.subplots(1, 2, num=title, figsize=figsize)
    axs[0].set(xlabel="x", ylabel="y")
    axs[1].set(xlabel="iteration", ylabel="objective")
    return fig, axs


def add_path12(ax0, ax1, path, objs=None, color="C0", labels=True):
    """Overlay one optimisation trajectory (reference tools/plotting.py:620-644)."""
    path = np.atleast_2d(np.asarray(path))
    if path.shape[1] >= 2:
        ax0.plot(path[:, 0], path[:, 1], "-o", color=color, ms=3)
        ax0.plot(*path[-1, :2], "s", color=color, ms=7)
    else:
        ax0.plot(path[:, 0], "-o", color=color, ms=3)
    if objs is not None:
        ax1.plot(np.asarray(objs), "-o", color=color, ms=3)
    if labels:
        ax0.annotate("end", path[-1, :2], color=color, fontsize="x-small")


def plt_production(ax, production, obs=None, dt=None, title=""):
    """Single-axis all-wells production plot (reference S3 `plt_production`):
    lines per producer, obs as markers. `production` (nTime, nPrd)."""
    production = np.asarray(production)
    t = np.arange(1, production.shape[0] + 1) * (dt or 1.0)
    for w in range(production.shape[1]):
        ax.plot(t, production[:, w], f"C{w}", lw=2, label=f"prd {w}")
    if obs is not None:
        obs = np.asarray(obs)
        for w in range(obs.shape[1]):
            ax.plot(t, obs[:, w], f"C{w}", marker="*", ls="", ms=5)
    ax.set(xlabel="time", ylabel="water sat. at producers", title=title,
           ylim=(-0.01, 1.01))
    ax.legend(fontsize="x-small")
    return ax


def anim(model, wsat_series, prod_series=None, style="water", interval=80):
    """Saturation-evolution animation (reference S3 `model.anim`).

    Returns a matplotlib FuncAnimation; save with `.save(path)` or display
    in a notebook via `HTML(anim.to_jshtml())`."""
    from matplotlib import animation as mpl_animation

    wsat_series = np.asarray(wsat_series)
    fig, axs = plt.subplots(1, 2 if prod_series is not None else 1, squeeze=False,
                            figsize=(9, 3.2))
    ax0 = axs[0, 0]
    im = plt_field(ax0, model, wsat_series[0], style, colorbar=True)
    if prod_series is not None:
        plt_production(axs[0, 1], np.asarray(prod_series))
        vline = axs[0, 1].axvline(0, color="k", lw=1)

    def update(t):
        im.set_data(np.asarray(wsat_series[t]).reshape(model.shape).T)
        ax0.set_title(f"t = {t}")
        arts = [im]
        if prod_series is not None:
            vline.set_xdata([t, t])
            arts.append(vline)
        return arts

    return mpl_animation.FuncAnimation(
        fig, update, frames=len(wsat_series), interval=interval, blit=False
    )


def field_console(model, compute, style="corr", title="", wells=False, argmax=False,
                  controls=None, **fixed):
    """Field 'dashboard' (reference tools/plotting.py:308-355).

    In a notebook with ipywidgets this is interactive; headless, it renders
    one static frame with the given (or default) control values and returns
    (fig, ax, field)."""
    controls = controls or getattr(compute, "controls", {})
    vals = {}
    for k, v in controls.items():
        if isinstance(v, (list, np.ndarray)):
            vals[k] = v[0]
        elif isinstance(v, tuple):
            vals[k] = v[0]
        else:
            vals[k] = v
    vals.update(fixed)
    try:  # pragma: no cover - notebook path
        import ipywidgets  # noqa: F401
        from ipywidgets import interact as _interact

        def show_frame(**kw):
            Z = compute(**kw)
            fig, ax = freshfig(title)
            plt_field(ax, model, Z, style, wells=wells, argmax=argmax, title=title)
            plt.show()

        _interact(show_frame, **controls)
        return None
    except ImportError:
        Z = compute(**vals)
        fig, ax = freshfig(title)
        plt_field(ax, model, Z, style, wells=wells, argmax=argmax, title=title)
        return fig, ax, Z


def layout1(ww, output):
    """Bespoke widget layout for field dashboards (reference
    tools/plotting.py:358-419): named controls arranged around the figure
    output —
        cN | cF/cFt | cP/cPt   (top row)
        output | cY            (middle)
        cX                     (bottom).
    Requires ipywidgets; headless, returns the output unchanged (the
    dashboards already degrade to static frames there)."""
    try:  # pragma: no cover - notebook path
        import ipywidgets as w

        def grab(*names):
            got = [ww[n] for n in names if n in ww]
            return w.VBox(got) if len(got) > 1 else (got[0] if got else w.Box())

        top = w.HBox([grab("N"), grab("F", "Ft"), grab("P", "Pt")])
        mid = w.HBox([output, grab("Y", "y")])
        bot = grab("X", "x")
        return w.VBox([top, mid, bot])
    except ImportError:
        return output


def toggle_items(series: dict, plot_fn):
    """Checkbox series toggler (reference tools/plotting.py:469-502);
    headless fallback plots everything."""
    try:  # pragma: no cover
        import ipywidgets as w
        from IPython.display import display

        boxes = {k: w.Checkbox(value=True, description=k) for k in series}

        def redraw(**kw):
            plot_fn({k: v for k, v in series.items() if kw[k]})

        display(w.interactive(redraw, **boxes))
    except ImportError:
        plot_fn(series)


def label_ax(ax, txt, **kwargs):
    kwargs.setdefault("fontsize", "small")
    return ax.text(0.01, 0.99, txt, transform=ax.transAxes, va="top", **kwargs)


def dash_join(*txts):
    return " — ".join(t for t in txts if t)


def ens_style(label, N=100):
    """Per-method line style with N-scaled alpha
    (reference tools/plotting.py:422-464)."""
    base = {
        "Truth": dict(color="k", lw=2.0, alpha=1.0),
        "Noisy": dict(color="C1", lw=0.0, alpha=1.0, marker="*"),
        "Prior": dict(color="C0", lw=0.5),
        "ES": dict(color="C2", lw=0.5),
        "LES": dict(color="C3", lw=0.5),
        "IES": dict(color="C4", lw=0.5),
        "ILES": dict(color="C5", lw=0.5),
        "ES0": dict(color="C6", lw=0.5),
        "MDA": dict(color="C8", lw=0.5),
    }
    st = dict(base.get(label, dict(color="C7", lw=0.5)))
    if "alpha" not in st:
        st["alpha"] = float(np.clip(1 - 0.5 * np.log10(max(N, 1) / 100 + 1e-9), 0.1, 1.0))
    return st


def interact(**controls):
    """Interactive-dashboard decorator. Uses ipywidgets when present
    (notebooks); otherwise returns the function unchanged (headless)."""

    def deco(fn):
        try:  # pragma: no cover - notebook path
            import ipywidgets  # noqa: F401
            from ipywidgets import interact as _interact

            _interact(fn, **controls)
        except Exception:
            fn.controls = controls
        return fn

    return deco


def init(backend=None):
    """Backend auto-selection (reference tools/plotting.py:153-242 detects
    inline/Qt5Agg/Colab). An explicit `backend` always wins; otherwise:

    - Google Colab / a Jupyter ZMQ kernel -> the inline backend (images
      render into the notebook);
    - a DISPLAY-less host -> 'Agg' (headless CI, this image);
    - an X/Wayland session -> the first importable interactive toolkit
      (QtAgg, then TkAgg), keeping the current backend if neither loads.

    Returns the backend actually in effect, so callers/tests can assert it.
    """
    import os as _os
    import sys as _sys

    if backend:
        matplotlib.use(backend, force=True)
        return matplotlib.get_backend()

    in_colab = "google.colab" in _sys.modules
    in_zmq_kernel = False
    try:  # pragma: no cover - notebook path
        from IPython import get_ipython

        shell = get_ipython()
        in_zmq_kernel = bool(shell) and type(shell).__name__ == "ZMQInteractiveShell"
    except Exception:
        pass

    if in_colab or in_zmq_kernel:  # pragma: no cover - notebook path
        try:
            matplotlib.use("module://matplotlib_inline.backend_inline",
                           force=True)
        except Exception:
            pass  # kernel already provides a working backend
    elif not (_os.environ.get("DISPLAY") or _os.environ.get("WAYLAND_DISPLAY")
              or _sys.platform == "darwin"):
        matplotlib.use("Agg", force=True)
    else:  # pragma: no cover - needs a display
        for cand in ("QtAgg", "TkAgg"):
            try:
                matplotlib.use(cand, force=True)
                break
            except Exception:
                continue
    return matplotlib.get_backend()


def show():
    plt.show()


def npv_kde(npvs_condnl, npvs_robust, title="NPV densities for optimal controls"):
    """Gaussian-KDE performance densities of each nominally-optimal control
    vs the robust one (reference notebooks/Optimise.py:1009-1066; after
    Essen2009): one thin curve per nominal control, the robust strategy as a
    thick white line, mean/min legend."""
    from scipy.stats import gaussian_kde

    npvs_condnl = np.asarray(npvs_condnl)
    npvs_robust = np.asarray(npvs_robust)
    fig, ax = freshfig(title, figsize=(7, 4))
    a, b = float(npvs_condnl.min()), float(npvs_condnl.max())
    grid = np.linspace(a, b if b > a else a + 1.0, 100)
    cmap = plt.get_cmap("tab20")
    for n, row in enumerate(npvs_condnl):
        if np.std(row) > 0:
            ax.plot(grid, gaussian_kde(row)(grid), c=cmap(n % 20), lw=1.2, alpha=0.7)
    if np.std(npvs_robust) > 0:
        ax.plot(grid, gaussian_kde(npvs_robust)(grid), "w", lw=3)
    leg = (
        "         Mean    Min",
        f"Robust:  {npvs_robust.mean():<6.3g}  {npvs_robust.min():.3g}",
        f"Nominal: {npvs_condnl.mean():<6.3g}  {npvs_condnl.min():.3g}",
    )
    ax.text(0.02, 0.97, "\n".join(leg), transform=ax.transAxes, va="top",
            ha="left", fontsize="medium", fontfamily="monospace",
            bbox=dict(facecolor="lightyellow", edgecolor="k", alpha=0.99,
                      boxstyle="round,pad=0.25"))
    ax.set(facecolor="k", xlabel="NPV", ylabel="Density (pdf)", xlim=(a, b), ylim=0)
    ax.tick_params(axis="y", left=False, labelleft=False)
    fig.tight_layout()
    return fig
