"""Static 2D grid geometry.

Re-designs the `TPFA_ResSim.grid.Grid2D` surface reconstructed in SURVEY.md
(S1.2/S1.3; usage at e.g. reference HistoryMatch.py:97,209,479,700-701).

The grid is a frozen, hashable dataclass of Python scalars — *static* under
jit. All index maps are pure functions accepting either NumPy or traced JAX
arrays, so wells may be placed by traced coordinates (needed for EnOpt over
well positions, reference Optimise.py:431-435).

Conventions (matching the reference call sites):
- `shape == (Nx, Ny)`; flat index is C-order over that shape: `ind = ix*Ny + iy`.
- `mesh` is the pair `meshgrid(xc, yc, indexing="ij")` of cell-centre coords.
- Wells are collocated to cell centres (reference HistoryMatch.py:197).
"""

from __future__ import annotations

import dataclasses
from functools import cached_property

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Grid2D:
    """Uniform 2D grid on the domain [0, Lx] x [0, Ly] with Nx x Ny cells."""

    Nx: int = 32
    Ny: int = 32
    Lx: float = 1.0
    Ly: float = 1.0

    # -- scalar geometry ---------------------------------------------------
    @property
    def shape(self) -> tuple[int, int]:
        return (self.Nx, self.Ny)

    @property
    def Nxy(self) -> int:
        return self.Nx * self.Ny

    @property
    def hx(self) -> float:
        return self.Lx / self.Nx

    @property
    def hy(self) -> float:
        return self.Ly / self.Ny

    @property
    def h2(self) -> float:
        """Cell area (hz = 1)."""
        return self.hx * self.hy

    @property
    def domain(self) -> tuple[tuple[float, float], tuple[float, float]]:
        """((0, 0), (Lx, Ly)) — matches reference `model.domain[1]` usage."""
        return ((0.0, 0.0), (self.Lx, self.Ly))

    # -- coordinates ---------------------------------------------------------
    @cached_property
    def xc(self) -> np.ndarray:
        """Cell-centre x coordinates, shape (Nx,)."""
        return (np.arange(self.Nx) + 0.5) * self.hx

    @cached_property
    def yc(self) -> np.ndarray:
        """Cell-centre y coordinates, shape (Ny,)."""
        return (np.arange(self.Ny) + 0.5) * self.hy

    @cached_property
    def mesh(self) -> tuple[np.ndarray, np.ndarray]:
        """Cell-centre meshgrid (X, Y), each of shape (Nx, Ny)."""
        return tuple(np.meshgrid(self.xc, self.yc, indexing="ij"))

    # -- index maps (work on NumPy scalars/arrays and traced JAX arrays) -----
    def sub2ind(self, ix, iy):
        """(ix, iy) subscripts -> flat index (C-order over (Nx, Ny))."""
        return jnp.asarray(ix) * self.Ny + jnp.asarray(iy)

    def ind2sub(self, ind):
        """Flat index -> (ix, iy)."""
        ind = jnp.asarray(ind)
        return ind // self.Ny, ind % self.Ny

    def sub2xy(self, ix, iy):
        """Subscripts -> cell-centre coordinates (x, y)."""
        x = (jnp.asarray(ix) + 0.5) * self.hx
        y = (jnp.asarray(iy) + 0.5) * self.hy
        return jnp.stack([x, y], axis=-1)

    def ind2xy(self, ind):
        """Flat index -> (x, y), stacked on the *first* axis like the reference
        (`xy_obs = model.ind2xy(prod_inds)` then `.T` used as points)."""
        ix, iy = self.ind2sub(ind)
        x = (ix + 0.5) * self.hx
        y = (iy + 0.5) * self.hy
        return jnp.stack([x, y], axis=0)

    def xy2sub(self, x, y):
        """Coordinates -> subscripts of the containing cell (clipped to grid)."""
        ix = jnp.clip(jnp.floor(jnp.asarray(x) / self.hx).astype(jnp.int32), 0, self.Nx - 1)
        iy = jnp.clip(jnp.floor(jnp.asarray(y) / self.hy).astype(jnp.int32), 0, self.Ny - 1)
        return ix, iy

    def xy2ind(self, x, y):
        """Coordinates -> flat cell index (wells collocate to cell centres)."""
        ix, iy = self.xy2sub(x, y)
        return self.sub2ind(ix, iy)

    def in_domain(self, x, y):
        """Validity predicate: coordinates inside [0,Lx]x[0,Ly].

        jit-safe replacement for the reference's raise-on-invalid behaviour
        (exception-as-penalty, reference Optimise.py:120-125)."""
        x = jnp.asarray(x)
        y = jnp.asarray(y)
        return (x >= 0) & (x <= self.Lx) & (y >= 0) & (y <= self.Ly)
