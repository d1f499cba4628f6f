"""Ensemble optimisation (EnOpt) layer: gradients, line search, NPV objective."""

from historymatching_tpu.opt.enopt import (  # noqa: F401
    EnGrad,
    Backtracker,
    GD,
    gd_scan,
    gd_scan_multi,
)
from historymatching_tpu.opt.npv import NPVConfig, accounting, npv, prd_sats  # noqa: F401
from historymatching_tpu.opt.transforms import (  # noqa: F401
    balance_rates,
    coordinate_transform,
    equalize,
    rate_transform,
    sigmoid,
)
