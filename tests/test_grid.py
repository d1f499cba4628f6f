import numpy as np

from historymatching_tpu.grid import Grid2D


def test_shapes_and_geometry():
    g = Grid2D(Nx=20, Ny=10, Lx=2.0, Ly=1.0)
    assert g.shape == (20, 10)
    assert g.Nxy == 200
    assert np.isclose(g.hx, 0.1) and np.isclose(g.hy, 0.1)
    assert g.domain == ((0.0, 0.0), (2.0, 1.0))
    X, Y = g.mesh
    assert X.shape == (20, 10) and Y.shape == (20, 10)
    assert np.isclose(X[0, 0], 0.05) and np.isclose(Y[0, 0], 0.05)
    assert np.isclose(X[-1, -1], 1.95) and np.isclose(Y[-1, -1], 0.95)


def test_index_roundtrips():
    g = Grid2D(Nx=7, Ny=5, Lx=1.4, Ly=1.0)
    inds = np.arange(g.Nxy)
    ix, iy = g.ind2sub(inds)
    assert np.array_equal(np.asarray(g.sub2ind(ix, iy)), inds)
    # xy2ind(ind2xy(i)) == i (cell centres map back to their cell)
    xy = np.asarray(g.ind2xy(inds))
    assert xy.shape == (2, g.Nxy)
    back = np.asarray(g.xy2ind(xy[0], xy[1]))
    assert np.array_equal(back, inds)


def test_xy2ind_clipping_and_collocation():
    g = Grid2D(Nx=4, Ny=4, Lx=1.0, Ly=1.0)
    # Exactly on the far boundary clips into the last cell
    assert int(g.xy2ind(1.0, 1.0)) == g.Nxy - 1
    assert int(g.xy2ind(0.0, 0.0)) == 0
    # Anywhere within a cell maps to that cell
    assert int(g.xy2ind(0.26, 0.01)) == g.sub2ind(1, 0)


def test_in_domain():
    g = Grid2D(Nx=4, Ny=4, Lx=2.0, Ly=1.0)
    assert bool(g.in_domain(0.0, 1.0))
    assert not bool(g.in_domain(-0.01, 0.5))
    assert not bool(g.in_domain(0.5, 1.01))
