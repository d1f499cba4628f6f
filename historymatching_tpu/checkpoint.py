"""Ensemble-state checkpointing.

The reference has no serialization at all — its only "resume" is the
simulator restart from a saturation state (SURVEY.md §5). Here restart stays
first-class (`simulate(model, wsat0, ...)` from any state), and this module
adds real on-disk checkpoints of arbitrary array pytrees (ensembles,
saturation states, RNG keys, iteration counters) so long histories /
optimisation runs survive interruption.

Format: a single .npz with path-flattened keys — no pickle, no framework
lock-in; loads as plain NumPy anywhere.
"""

from __future__ import annotations

import os

import jax
import numpy as np

_SEP = "//"


def _key_str(path):
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return _SEP.join(parts)


def save_checkpoint(path, state):
    """Save a pytree of arrays to `path` (.npz). Atomic (write + rename)."""
    flat = jax.tree_util.tree_flatten_with_path(state)[0]
    arrays = {_key_str(p): np.asarray(v) for p, v in flat}
    if not arrays:
        raise ValueError("empty checkpoint state")
    tmp = f"{path}.tmp"
    np.savez(tmp, **arrays)
    # np.savez appends .npz to the temp name
    os.replace(tmp if os.path.exists(tmp) else f"{tmp}.npz", path)
    return path


def load_checkpoint(path):
    """Load a checkpoint as a nested dict (path segments -> sub-dicts)."""
    out: dict = {}
    with np.load(path) as data:
        for k in data.files:
            parts = k.split(_SEP)
            d = out
            for p in parts[:-1]:
                d = d.setdefault(p, {})
            d[parts[-1]] = data[k]
    return out
