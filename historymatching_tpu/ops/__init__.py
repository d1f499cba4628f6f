"""Hot compute ops: TPFA stencil, batched CG, Pallas kernels."""

from historymatching_tpu.ops.stencil import (  # noqa: F401
    transmissibilities,
    stencil_diag,
    stencil_matvec,
)
from historymatching_tpu.ops.cg import pcg  # noqa: F401
