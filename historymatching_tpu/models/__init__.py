"""Model (simulator) families."""

from historymatching_tpu.models.ressim import Fluid, ResSim, SimResult, simulate  # noqa: F401
