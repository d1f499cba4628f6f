"""historymatching_tpu — TPU-native ensemble history matching & production optimisation.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
patnr/HistoryMatching (reference: /root/reference):

- 2D two-phase incompressible reservoir simulator (TPFA pressure via batched
  matrix-free CG; explicit upwind saturation transport with CFL substepping),
  fully jit/vmap/shard_map-able, ensemble members living in HBM.
- Ensemble data assimilation: ES, localized ES, IES, ILES, ES-MDA, ES0
  (data-space inversion), with distance-based localization tapers.
- Geostatistical Gaussian random-field priors (Cholesky and FFT samplers).
- EnOpt: ensemble-gradient well-control optimisation with batched line search,
  NPV objective/accounting, control transforms, robust (StoSAG etc.) gradients.
- Multi-chip scaling via a jax.sharding Mesh over an "ens" axis.

The reference is pure NumPy + multiprocessing; nothing here is a translation —
the compute path is (re)designed for the TPU's MXU/VPU and XLA's compilation
model (static shapes, lax control flow, fused elementwise ops).
"""

from historymatching_tpu.grid import Grid2D
from historymatching_tpu.models.ressim import Fluid, ResSim, simulate
from historymatching_tpu.da.update import (
    ens_update0,
    ens_update0_loc,
    ens_update0_loc_domains,
    ies,
    iles,
    iles_domains,
    es_mda,
    mda_alphas,
)
from historymatching_tpu.da import geostat, localization
from historymatching_tpu.da.geostat import gaussian_fields, sample_prior_perm
from historymatching_tpu.da.localization import bump, pairwise_distances
from historymatching_tpu.opt.enopt import EnGrad, Backtracker, GD, gd_scan
from historymatching_tpu.opt.npv import NPVConfig, npv, accounting
from historymatching_tpu import checkpoint, profiling, utils
from historymatching_tpu.utils import center, cov, corr, gaussian_noise, rinv, svals, vect
from historymatching_tpu.parallel.mesh import ens_mesh, shard_ens
from historymatching_tpu.parallel.runner import ensemble_simulate, forward_model

__version__ = "0.1.0"

__all__ = [
    "Grid2D",
    "Fluid",
    "ResSim",
    "simulate",
    "ens_update0",
    "ens_update0_loc",
    "ens_update0_loc_domains",
    "ies",
    "iles",
    "iles_domains",
    "es_mda",
    "mda_alphas",
    "geostat",
    "localization",
    "gaussian_fields",
    "sample_prior_perm",
    "bump",
    "pairwise_distances",
    "EnGrad",
    "Backtracker",
    "GD",
    "gd_scan",
    "NPVConfig",
    "npv",
    "accounting",
    "checkpoint",
    "profiling",
    "utils",
    "center",
    "cov",
    "corr",
    "gaussian_noise",
    "rinv",
    "svals",
    "vect",
    "ens_mesh",
    "shard_ens",
    "ensemble_simulate",
    "forward_model",
]
