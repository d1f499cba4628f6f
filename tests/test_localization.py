import numpy as np
from scipy.spatial.distance import pdist, squareform

from historymatching_tpu.da import localization as loc


def test_pairwise_distances_reference_doctests():
    A = [[0, 0], [0, 1], [1, 0], [1, 1]]
    D = np.asarray(loc.pairwise_distances(A))
    assert np.allclose(D, squareform(pdist(np.asarray(A), metric="euclidean")))

    A1 = np.arange(4)[:, None]
    D2 = np.asarray(loc.pairwise_distances(A1, [[2]])).T
    assert np.allclose(D2, [[2.0, 1.0, 0.0, 1.0]])

    Dp = np.asarray(loc.pairwise_distances(A1, domain=(4,)))
    assert np.allclose(Dp, [[0, 1, 2, 1], [1, 0, 1, 2], [2, 1, 0, 1], [1, 2, 1, 0]])

    # 1-D input = single point
    assert np.asarray(loc.pairwise_distances(np.arange(4))).shape == (1, 1)


def test_bump():
    x = np.linspace(-2, 2, 401)
    v = np.asarray(loc.bump(x))
    assert np.all(v[np.abs(x) >= 1] == 0)
    assert np.isclose(v[x == 0][0], 1.0)
    assert np.all(v >= 0) and np.all(v <= 1)
    # sharpness exponentiates
    v2 = np.asarray(loc.bump(x, sharpness=2))
    inside = np.abs(x) < 1
    assert np.allclose(v2[inside], v[inside] ** 2)


def test_rectangular_partitioning_covers():
    batches = loc.rectangular_partitioning([4, 13], [2, 4])
    allidx = np.sort(np.concatenate(batches))
    assert np.array_equal(allidx, np.arange(4 * 13))


def test_rectangular_partitioning_divisible_is_blocked_reshape():
    """On evenly-divisible grids (the only case domain_partition produces)
    the partitioning must equal the blocked reshape/transpose one-liner."""
    Nx, Ny, sx, sy = 8, 6, 4, 2
    expect = (np.arange(Nx * Ny)
              .reshape(Nx // sx, sx, Ny // sy, sy)
              .transpose(0, 2, 1, 3)
              .reshape(-1, sx * sy))
    got = np.stack(loc.rectangular_partitioning([Nx, Ny], [sx, sy]))
    assert np.array_equal(got, expect)
    # 3-D smoke: exact cover with equal-sized domains
    got3 = loc.rectangular_partitioning([4, 4, 6], [2, 4, 3])
    assert len(got3) == 2 * 1 * 2 and all(len(b) == 24 for b in got3)
    assert np.array_equal(np.sort(np.concatenate(got3)), np.arange(96))
    # coordinate form round-trips through ravel_multi_index
    coords = loc.rectangular_partitioning([4, 13], [2, 4], do_ind=False)
    flats = loc.rectangular_partitioning([4, 13], [2, 4])
    for c, f in zip(coords, flats):
        assert np.array_equal(np.ravel_multi_index(c, (4, 13)), f)


def test_dist_to_obs_shape_and_tiling():
    from historymatching_tpu.grid import Grid2D

    g = Grid2D(Nx=6, Ny=5, Lx=2, Ly=1)
    obs_inds = np.array([3, 17])
    D = np.asarray(loc.dist_to_obs(g, obs_inds, nTime=4))
    assert D.shape == (30, 8)
    # obs tiled: block repeats every nObs columns
    assert np.allclose(D[:, :2], D[:, 2:4])


def test_xy_max_corr(key=None):
    import jax
    import jax.numpy as jnp

    from historymatching_tpu.grid import Grid2D

    g = Grid2D(Nx=10, Ny=10, Lx=2, Ly=1)
    rng = np.random.default_rng(0)
    N, nTime, nPrd = 60, 8, 2
    param = rng.normal(size=(N, g.Nxy))
    # make production at well w perfectly track the parameter at a known cell
    cells = [g.sub2ind(2, 3), g.sub2ind(7, 6)]
    prod = np.zeros((N, nTime, nPrd))
    for w, c in enumerate(cells):
        prod[:, :, w] = param[:, int(c)][:, None] + 0.01 * rng.normal(size=(N, nTime))
    paths = loc.xy_max_corr(g, jnp.asarray(param), jnp.asarray(prod), t_min=2)
    assert paths.shape == (nPrd, nTime, 2)
    for w, c in enumerate(cells):
        expect = np.asarray(g.ind2xy(int(c)))
        assert np.allclose(paths[w, 2:], expect[None, :], atol=1e-9)
        # pre-t_min fallback copies the t_min location
        assert np.allclose(paths[w, 0], paths[w, 2])


def test_dist_to_moving_obs_and_masked_update(key=None):
    """The experimental 'moving mask' (reference HistoryMatch.py:853-858,
    disabled there): taper centred on the xy_max_corr trajectories instead
    of the wells. Static paths at the well locations must reproduce
    dist_to_obs exactly; genuinely moving paths must yield a different,
    finite localized update."""
    import jax
    import jax.numpy as jnp

    from historymatching_tpu.da.update import decorrelator, ens_update0_loc
    from historymatching_tpu.grid import Grid2D
    from historymatching_tpu.utils import gaussian_noise

    g = Grid2D(Nx=8, Ny=8, Lx=2, Ly=1)
    nPrd, nTime, N = 2, 5, 24
    obs_inds = np.array([g.sub2ind(1, 1), g.sub2ind(6, 6)])

    # static paths == well locations -> identical distances
    xy_wells = np.asarray(g.ind2xy(obs_inds)).T  # (nPrd, 2)
    static_paths = np.broadcast_to(xy_wells[:, None, :], (nPrd, nTime, 2))
    D_static = np.asarray(loc.dist_to_moving_obs(g, static_paths))
    D_fixed = np.asarray(loc.dist_to_obs(g, obs_inds, nTime=nTime))
    assert D_static.shape == (g.Nxy, nTime * nPrd)
    assert np.allclose(D_static, D_fixed)

    # moving paths: drift one well's mask across the domain over time
    paths = np.array(static_paths, copy=True)
    paths[0, :, 0] = np.linspace(0.2, 1.8, nTime)
    D_move = np.asarray(loc.dist_to_moving_obs(g, paths))
    assert not np.allclose(D_move, D_fixed)

    # drive a localized update with the moving taper
    k = jax.random.PRNGKey(11)
    k1, k2, k3 = jax.random.split(k, 3)
    prior = jax.random.normal(k1, (N, g.Nxy))
    obs_ens = jax.random.normal(k2, (N, nTime * nPrd)) * 0.3
    obs = jnp.zeros(nTime * nPrd)
    R12 = 0.1 * jnp.eye(nTime * nPrd)
    perturbs = gaussian_noise(k3, N, nTime * nPrd, L=R12)
    dec = decorrelator(R12)
    post_move = ens_update0_loc(prior, obs_ens, obs, perturbs, dec,
                                jnp.asarray(loc.bump(D_move / 1.2)))
    post_fix = ens_update0_loc(prior, obs_ens, obs, perturbs, dec,
                               jnp.asarray(loc.bump(D_fixed / 1.2)))
    assert np.isfinite(np.asarray(post_move)).all()
    assert not np.allclose(np.asarray(post_move), np.asarray(post_fix))


def test_corr_wells_taper_and_mask(key):
    import jax
    import jax.numpy as jnp

    from historymatching_tpu.da.localization import corr_wells, dist_to_obs
    from historymatching_tpu.grid import Grid2D

    g = Grid2D(Nx=8, Ny=8, Lx=2, Ly=1)
    nPrd, nTime, N = 2, 5, 30
    k1, k2 = jax.random.split(key)
    prior = jax.random.normal(k1, (N, g.Nxy))
    prod = jax.random.normal(k2, (N, nTime, nPrd))
    dists = dist_to_obs(g, np.array([3, 60]), nTime=nTime)
    C = corr_wells(prior, prod, dists, 2, 1, nPrd)
    assert C.shape == (g.Nxy,)
    assert np.all(np.abs(np.asarray(C)) <= 1 + 1e-9)
    Ct = corr_wells(prior, prod, dists, 2, 1, nPrd, radius=0.5)
    Ct = np.asarray(Ct)
    # masked cells are exactly where the taper is < 1e-3
    from historymatching_tpu.da.localization import bump

    c = np.asarray(bump(np.asarray(dists)[:, 1 + nPrd * 2] / 0.5))
    assert np.array_equal(np.isnan(Ct), c < 1e-3)


def test_suggest_taper_radius_smoke(key):
    import jax
    import jax.numpy as jnp

    from historymatching_tpu.da.localization import dist_to_obs, suggest_taper_radius
    from historymatching_tpu.grid import Grid2D

    g = Grid2D(Nx=8, Ny=8, Lx=2, Ly=1)
    nPrd, nTime, N = 2, 6, 40
    k1, k2 = jax.random.split(key)
    prior = jax.random.normal(k1, (N, g.Nxy))
    # production correlated with a local patch of the parameter field
    prod = jnp.stack([prior[:, :4].mean(1)] * nTime, 1)[:, :, None].repeat(nPrd, 2)
    prod = prod + 0.1 * jax.random.normal(k2, (N, nTime, nPrd))
    dists = dist_to_obs(g, np.array([3, 60]), nTime=nTime)
    r, s, scores = suggest_taper_radius(prior, prod, dists, nPrd, n_small=10,
                                        radii=(0.5, 1.0, 2.0), sharps=(1.0,))
    assert r in (0.5, 1.0, 2.0) and s == 1.0
    assert all(np.isfinite(v) for v in scores.values())
