"""Data assimilation layer: priors, localization, ensemble updates."""

from historymatching_tpu.da import geostat, localization, update  # noqa: F401
