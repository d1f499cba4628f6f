"""Multi-device ensemble parallelism (mesh + runners)."""

from historymatching_tpu.parallel.mesh import ens_mesh, shard_ens  # noqa: F401
from historymatching_tpu.parallel.runner import (  # noqa: F401
    ensemble_simulate,
    forward_model,
    perm_transf,
    set_perm,
)
